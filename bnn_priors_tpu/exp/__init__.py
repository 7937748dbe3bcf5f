"""Experiment glue: sacred-style config + run directories."""
