"""Flocking quality sweep (VERDICT item 4): round-1 LocalGNN_DB reached
full-trajectory cost 1.18 vs expert 0.108 at 20 epochs. With the jitted
closed-loop rollout, sweep epochs x DAGger type to narrow the gap."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from graph_neural_networks_tpu.data.flocking import Flocking
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu import training as T

rng = np.random.default_rng(0)
data = Flocking(nAgents=50, commRadius=2.0, repelDist=1.0, nTrain=400,
                nValid=20, nTest=20, duration=2.0, samplingTime=0.01,
                rng=rng)
# expert baseline
vel_exp = data.getData("vel", "test")
print("expert cost:", data.evaluate(vel=vel_exp), flush=True)

for epochs, dagger, pe in ((30, "randomEpoch", 0.993),
                           (60, "randomEpoch", 0.993),
                           (60, "randomEpoch", 0.9),
                           (60, "replaceTimeBatch", 0.993)):
    arch = archt.LocalGNN_DB([6, 64], [3], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss
                    if hasattr(T.losses, "mse_loss") else
                    (lambda yh, y: jnp.mean((yh - y) ** 2)),
                    {"name": "ADAM", "lr": 5e-4}, T.TrainerFlocking,
                    T.evaluate_flocking, name=f"fl{epochs}{dagger}{pe}",
                    saveDir="/tmp/diag_fl", N=50, T=3)
    model.train(data, epochs, 20, validationInterval=20, probExpert=pe,
                DAGgerType=dagger)
    res = model.evaluate(data)
    print(f"epochs={epochs} dagger={dagger} pE={pe}: "
          f"full {res['costBestFull']:.3f} end {res['costBestEnd']:.4f}",
          flush=True)
