"""TPU compute path: GSO container, SpMM kernels, filter functionals.

Everything here is jittable, statically shaped, and functional: weights and
graph structure go in, activations come out. The one true primitive is the
graph shift (an SpMM `x @ S`); every filter family lowers to it.
"""

from graph_neural_networks_tpu.ops.gso import Gso, as_gso, gshift  # noqa: F401
from graph_neural_networks_tpu.ops.ell import (  # noqa: F401
    EllGso, ell_from_dense, ell_shift, ell_shift_rows, ell_to_dense,
    ell_topk)
from graph_neural_networks_tpu.ops import filters  # noqa: F401
from graph_neural_networks_tpu.ops import spmm  # noqa: F401
