from graph_neural_networks_tpu.utils import graph  # noqa: F401
from graph_neural_networks_tpu.utils import misc  # noqa: F401
from graph_neural_networks_tpu.utils import native  # noqa: F401
from graph_neural_networks_tpu.utils import visual  # noqa: F401
