"""The analysis notebook (SURVEY.md §2a #13) must stay executable offline.

Runs notebooks/circumplex.ipynb with nbclient on the CPU backend and checks
the final structural assertion inside the notebook held (it raises into the
execution otherwise): PCA of the trained model's softmax outputs recovers
the toy corpus's planted circular emotion structure.
"""

import os

import pytest

pytestmark = pytest.mark.heavy  # trains the text model inside the notebook

NB_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "notebooks")


def test_circumplex_notebook_executes():
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")

    path = os.path.join(NB_DIR, "circumplex.ipynb")
    nb = nbformat.read(path, as_version=4)
    png = os.path.join(NB_DIR, "circumplex_toy.png")
    try:
        client = nbclient.NotebookClient(
            nb, timeout=560, kernel_name="python3",
            resources={"metadata": {"path": NB_DIR}})
        client.execute()
    finally:
        if os.path.exists(png):
            os.remove(png)

    streams = "".join(
        out.get("text", "")
        for cell in nb.cells for out in cell.get("outputs", []))
    assert "circular adjacency recovered:" in streams
    # The generator script and the checked-in notebook must not drift.
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        gen = os.path.join(d, "make_circumplex_nb.py")
        with open(os.path.join(NB_DIR, "make_circumplex_nb.py")) as f:
            src = f.read()
        with open(gen, "w") as f:
            f.write(src)
        subprocess.run([sys.executable, gen], check=True, cwd=d)
        with open(os.path.join(d, "circumplex.ipynb")) as f:
            regenerated = f.read()
    with open(path) as f:
        assert f.read() == regenerated
