"""graph_neural_networks_tpu: a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
alelab-upenn/graph-neural-networks (`alegnn` v0.4): Graph Signal
Processing-style GNNs built around the Graph Shift Operator (GSO), with

  * `utils.graph`   -- host-side graph math (generators, normalizations,
                       GFT, orderings, neighborhoods, coarsening),
  * `ops`           -- the TPU compute path: one SpMM/shift primitive that
                       every filter family (LSIGF, node-variant,
                       edge-variant, spectral, ARMA, attention, recurrent)
                       lowers to, with dense-MXU and sparse (ELL/Pallas)
                       backends,
  * `models`        -- flax.linen layers and the architecture zoo
                       (Selection/Aggregation/Local/Spectral/EdgeVariant/
                       GAT/GRNN ... ),
  * `data`          -- the five example task datasets,
  * `training`      -- Model/Trainer/evaluator harness with Best/Last
                       checkpointing,
  * `parallel`      -- device-mesh sharding: data parallelism and graph
                       (node) partition parallelism with halo exchange,
  * `serving`       -- AOT-compiled fixed-shape inference, batch padding,
                       bf16 mode, StableHLO export (jax.export).

Unlike the reference, the GSO is carried as a structured sparse container
(`ops.gso.Gso`) and every hot loop is a jitted, statically-shaped XLA
program; recurrences use `lax.scan`, K-tap shift registers are unrolled
matmul chains feeding a single MXU contraction.
"""

__version__ = "0.1.0"

from graph_neural_networks_tpu import utils  # noqa: F401
from graph_neural_networks_tpu import ops  # noqa: F401
from graph_neural_networks_tpu import models  # noqa: F401
from graph_neural_networks_tpu import data  # noqa: F401
from graph_neural_networks_tpu import training  # noqa: F401
from graph_neural_networks_tpu import serving  # noqa: F401
