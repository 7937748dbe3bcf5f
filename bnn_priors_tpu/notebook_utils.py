"""Run-collection utilities for analysis notebooks
(reference: `bnn_priors/notebook_utils.py`)."""
from __future__ import annotations

import json
import os
from pathlib import Path

import pandas as pd

__all__ = ("flatten", "collect_runs", "unique_cols")


def flatten(in_dict):
    out = {}
    for k, v in in_dict.items():
        if isinstance(v, dict):
            out.update({f"{k}.{vk}": vv for vk, vv in flatten(v).items()})
        else:
            out[k] = v
    return out


def collect_runs(base_log_dir, metrics_must_exist=True) -> pd.DataFrame:
    "gather config.json + run.json of every run dir into a DataFrame"
    base_log_dir = Path(base_log_dir)
    series_list = []
    for run in os.listdir(base_log_dir):
        if run in ("_sources", "jugdir"):
            continue
        if metrics_must_exist and not (base_log_dir / run / "metrics.h5").exists():
            continue
        try:
            with open(base_log_dir / run / "run.json") as f:
                s2 = pd.Series(flatten(json.load(f)))
            with open(base_log_dir / run / "config.json") as f:
                s1 = pd.Series(flatten(json.load(f)))
        except FileNotFoundError:
            continue
        s2["the_dir"] = base_log_dir / run
        series_list.append(pd.concat([s1, s2]))
    return pd.DataFrame(series_list)


_DEFAULT_BLACKLIST = {
    "heartbeat", "log_dir", "run_id", "start_time", "status", "stop_time",
    "the_dir", "seed",
} | {f"result.{k}" for k in
     ("acc_last", "acc_ensemble", "lp_last", "lp_ensemble", "ece", "ace",
      "rmsce", "auroc", "auprc")}


def unique_cols(df: pd.DataFrame, blacklist=None):
    "columns that vary across runs (the swept hyperparameters)"
    blacklist = _DEFAULT_BLACKLIST if blacklist is None else blacklist
    cols = []
    for c in df.columns:
        if c in blacklist:
            continue
        try:
            if df[c].astype(str).nunique() > 1:
                cols.append(c)
        except TypeError:
            continue
    return cols
