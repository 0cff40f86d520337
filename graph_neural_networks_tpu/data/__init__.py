"""Data layer: the five example-task datasets + helpers.

Re-designs of ``alegnn/utils/dataTools.py``: numpy at build time (host),
device arrays only at the training-step boundary. Datasets with external
files (Authorship .mat, MovieLens-100k, FacebookEgo pickle) load from a
`data_dir` when present and fall back to documented synthetic generators
otherwise (this container has zero egress).
"""

from graph_neural_networks_tpu.data.base import (  # noqa: F401
    Data, DataForClassification, normalize_data, change_data_type,
    invert_tensor_ew)
from graph_neural_networks_tpu.data.datasets import (  # noqa: F401
    SourceLocalization, Authorship, MovieLens, Epidemics, FacebookEgo,
    TwentyNews)
from graph_neural_networks_tpu.data.flocking import Flocking  # noqa: F401
