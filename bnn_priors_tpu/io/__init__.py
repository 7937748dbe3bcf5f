"""Persistence: HDF5 metrics time-series, sample banks, chain checkpoints."""
from .checkpoint import load_chain_checkpoint, save_chain_checkpoint
from .hdf5 import HDF5Metrics, HDF5ModelSaver, load_samples
