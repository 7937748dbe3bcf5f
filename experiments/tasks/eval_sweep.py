#!/usr/bin/env python3
"""Evaluation fan-out over finished training runs — counterpart of the
reference's ``experiments/jug/0_31_eval.py``: collect completed runs from a
log dir, then enqueue one eval task per run for any number of workers.

    python experiments/tasks/eval_sweep.py <base_log_dir> [eval args...]
"""
import sys
from pathlib import Path

experiments_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(experiments_dir.parent))

from bnn_priors_tpu.exp import TaskQueue, run_script_task  # noqa: E402
from bnn_priors_tpu.notebook_utils import collect_runs  # noqa: E402

base = Path(sys.argv[1]) if len(sys.argv) > 1 else \
    experiments_dir.parent / "logs" / "sgd_baselines"
q = TaskQueue(base / "eval_jugdir")


@q.generator
def eval_bnn(config_file, **config):
    return run_script_task(experiments_dir / "eval_bnn.py", base / "evals",
                           style="sacred", config_file=config_file, **config)


runs_df = collect_runs(base)
for _, row in runs_df.iterrows():
    cfg = Path(row["the_dir"]) / "config.json"
    eval_bnn(str(cfg), skip_first=50)
    eval_bnn(str(cfg), eval_data="cifar10c-gaussian_blur",
             calibration_eval=True, skip_first=50)
    eval_bnn(str(cfg), eval_data="svhn", ood_eval=True, skip_first=50)

if __name__ == "__main__":
    q.cleanup()
    n = q.execute()
    print(f"[taskqueue] worker finished {n} tasks; status: {q.status()}")
