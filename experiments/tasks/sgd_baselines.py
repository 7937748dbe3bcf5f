#!/usr/bin/env python3
"""SGD-baseline sweep as a shared task queue — the TPU-framework
counterpart of the reference's jug task file
``experiments/jug/0_31_googleresnet_cifar10_sgd.py``.

Run any number of workers (on any number of hosts sharing the log dir):

    python experiments/tasks/sgd_baselines.py            # claim + run tasks
    python experiments/tasks/sgd_baselines.py status     # like `jug status`

Each worker claims tasks atomically from ``logs/sgd_baselines/jugdir`` and
runs ``train_sgd.py`` as a subprocess into its own numbered run dir.
"""
import sys
from pathlib import Path

experiments_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(experiments_dir.parent))

from bnn_priors_tpu.exp import TaskQueue, run_script_task  # noqa: E402

name = Path(__file__).name[:-3]
base_dir = experiments_dir.parent / "logs" / name
q = TaskQueue(base_dir / "jugdir")


@q.generator
def train_sgd(replicate, **config):
    return run_script_task(experiments_dir / "train_sgd.py",
                           base_dir / f"r{replicate}", style="argparse",
                           **config)


for i in range(10):
    train_sgd(i, model="googleresnet", data="cifar10_augmented",
              lr=0.05, momentum=0.9, batch_size=128,
              sampling_decay="stairs", n_epochs=150 * 4, seed=i)
    train_sgd(i, model="googleresnet", data="cifar10",
              lr=0.05, momentum=0.9, batch_size=128,
              sampling_decay="stairs", n_epochs=150 * 4, seed=i)
    for data in ("mnist", "fashion_mnist"):
        for model in ("classificationconvnet", "classificationdensenet"):
            train_sgd(i, model=model, data=data, lr=0.05, momentum=0.9,
                      batch_size=128, sampling_decay="stairs",
                      n_epochs=150 * 4, seed=i)

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "status":
        print(q.status())
    else:
        q.cleanup()
        n = q.execute()
        print(f"[taskqueue] worker finished {n} tasks; status: {q.status()}")
