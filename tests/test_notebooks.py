"""Execute the tutorial notebooks' code cells end to end (CPU backend).

The reference's only executable validation is its demo notebooks
(SURVEY §4); here they are first-class tested artifacts: every code cell
of ``examples/makedata.ipynb`` and ``examples/demo.ipynb`` runs in
order, in a shared namespace per notebook, in a temp directory.
"""

import json
import os
import pathlib

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run_notebook(path, workdir):
    with open(path) as f:
        nb = json.load(f)
    cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert cells, f"{path} has no code cells"
    ns = {}
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        for i, cell in enumerate(cells):
            src = cell["source"]
            if isinstance(src, list):
                src = "".join(src)
            try:
                # exec like the notebook kernel: last-expression display
                # is irrelevant, statements are what matter
                exec(compile(src, f"{path.name}[cell {i}]", "exec"), ns)
            except Exception as e:  # pragma: no cover - failure reporting
                pytest.fail(f"{path.name} code cell {i} raised "
                            f"{type(e).__name__}: {e}\n---\n{src}")
    finally:
        os.chdir(cwd)
    return ns


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("notebooks")


def test_makedata_notebook(workdir):
    _run_notebook(EXAMPLES / "makedata.ipynb", workdir)
    assert (workdir / "demo_data.h5ad").exists()
    assert (workdir / "demo_samplem.csv").exists()


def test_demo_notebook(workdir):
    # runs after makedata in the same dir, exercising the read_h5ad path
    ns = _run_notebook(EXAMPLES / "demo.ipynb", workdir)
    assert 0 < ns["res"].p <= 1
    assert 0 < ns["p_sex"] <= 1
    assert (workdir / "demo_umap_ncorr.png").exists()
    assert ns["NAM"].shape[0] == 50
