"""Flocking quality: does a 2-layer LocalGNN_DB close the remaining 8%
gap to the expert (round-2: 1.613 vs 1.489, single layer [6,64] K=[3])?
CPU run at the full config. Writes experiments/diag_flocking2.json."""
import json, os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures_time as archt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "diag_flocking2.json"), "w", buffering=1)

def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")

rng = np.random.default_rng(0)
data = D.Flocking(nAgents=50, commRadius=2.0, repelDist=1.0, nTrain=400,
                  nValid=20, nTest=20, duration=2.0, samplingTime=0.01,
                  rng=rng)
expert = float(data.evaluate(vel=data.getData("vel", "test")))
emit(expert_cost=expert)

for (name, F, K, epochs) in [
        ("LocalGNN2Ly", [6, 32, 32], [3, 3], 40),
]:
    arch = archt.LocalGNN_DB(F, K, True, "tanh", [2], 1)
    with tempfile.TemporaryDirectory() as td:
        model = T.Model(arch, T.losses.mse_loss,
                        {"name": "ADAM", "lr": 5e-4}, T.TrainerFlocking,
                        T.evaluate_flocking, name=name, saveDir=td,
                        seed=0, N=50, T=5)
        model.train(data, epochs, 20, validationInterval=20,
                    probExpert=0.993)
        res = model.evaluate(data)
    emit(name=name, F=F, K=K, epochs=epochs,
         costBestFull=float(res["costBestFull"]),
         costBestEnd=float(res["costBestEnd"]),
         vs_expert=float(res["costBestFull"]) / expert)
emit(done=True)
