"""Persistence: HDF5 metrics time-series and sample banks."""
from .hdf5 import HDF5Metrics, HDF5ModelSaver, load_samples
