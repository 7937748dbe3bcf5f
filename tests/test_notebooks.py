"""Notebook smoke tests: the five paper-figure notebooks
(reference `experiments/Plot_*.ipynb`, SURVEY §2.8) parse as valid
nbformat v4; the data-only ones (bundled fitted-prior pickles, no
training) also execute end-to-end."""
from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")

EXP = Path(__file__).resolve().parent.parent / "experiments"
ALL = ["Plot_weight_histograms", "Plot_CIFAR10_resnet",
       "Plot_MNIST_convnet_covariances", "Plot_tempering_curves",
       "Plot_temperature_diagnostics"]
DATA_ONLY = ["Plot_CIFAR10_resnet", "Plot_MNIST_convnet_covariances"]


@pytest.mark.parametrize("name", ALL)
def test_notebook_parses(name):
    nb = nbformat.read(EXP / f"{name}.ipynb", as_version=4)
    nbformat.validate(nb)
    assert any(c.cell_type == "code" for c in nb.cells)


@pytest.mark.parametrize("name", DATA_ONLY)
def test_data_notebook_executes(name):
    nbclient = pytest.importorskip("nbclient")
    nb = nbformat.read(EXP / f"{name}.ipynb", as_version=4)
    client = nbclient.NotebookClient(
        nb, timeout=300, kernel_name="python3",
        resources={"metadata": {"path": str(EXP)}})
    client.execute()
