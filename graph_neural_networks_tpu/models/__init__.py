"""Model zoo: flax.linen layers and architecture wrappers.

`layers` holds the stateful (parameterized) graph layers; `architectures`
composes them into the 19 architectures of the reference's
alegnn/modules/architectures*.py, re-designed as functional JAX programs
(params in, activations out; graph structure passed per call).
"""

from graph_neural_networks_tpu.models import layers  # noqa: F401
from graph_neural_networks_tpu.models import architectures  # noqa: F401
from graph_neural_networks_tpu.models import architectures_time  # noqa: F401
