"""Training/eval harness: Model binding, trainers (incl. single-node and
flocking/DAGger), evaluators, and loss functions.

Re-design of ``alegnn/modules/{model,training,evaluation,loss}.py`` on JAX:
the train step is one jitted value_and_grad + optax update; checkpoints are
flax-serialized pytrees with the reference's Best/Last contract.
"""

from graph_neural_networks_tpu.training import losses  # noqa: F401
from graph_neural_networks_tpu.training.model import Model  # noqa: F401
from graph_neural_networks_tpu.training.trainer import (  # noqa: F401
    Trainer, TrainerSingleNode, TrainerFlocking)
from graph_neural_networks_tpu.training.evaluation import (  # noqa: F401
    evaluate, evaluate_single_node, evaluate_flocking)
