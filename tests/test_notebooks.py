"""Headless execution of the shipped notebooks (the reference's
notebook-as-test culture, ``CONTRIBUTING.md:62`` "run notebooks/scripts to
verify before opening a PR" — here as an automated check).

Each notebook is executed end-to-end with ``nbclient`` after shrinking its
data/step constants to CI scale via EXACT source substitutions; every
substitution must match, so if a notebook's constants are renamed this test
fails loudly instead of silently running the full configuration.
"""

import pathlib

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

NB_DIR = pathlib.Path(__file__).resolve().parents[1] / "notebooks"

SHRINK = {
    "interactive.ipynb": [
        ('DATA_ROOT = "/tmp/nb_data"', 'DATA_ROOT = "{tmp}/nb_data"'),
        ("num_cases=6, shape=(64, 64, 52)",
         "num_cases=3, shape=(32, 32, 28)"),
        ('"CASE_LIMIT": 6', '"CASE_LIMIT": 3'),
        ('"TRAIN_STEPS": 150', '"TRAIN_STEPS": 20'),
        ('"GLOBAL_BATCH": 8192', '"GLOBAL_BATCH": 2048'),
        ('"MICRO_BATCH": 4096', '"MICRO_BATCH": 1024'),
        ('"EVAL_EVERY": 50', '"EVAL_EVERY": 10'),
        ('"OUT_DIR": "/tmp/nb_run"', '"OUT_DIR": "{tmp}/nb_run"'),
        ("width=512", "width=96"),
    ],
    "advanced_training.ipynb": [
        ('DATA_ROOT = "/tmp/nb2_data"', 'DATA_ROOT = "{tmp}/nb2_data"'),
        ("num_cases=6, shape=(48, 48, 40)",
         "num_cases=3, shape=(32, 32, 28)"),
        ("c.data.case_limit = 6", "c.data.case_limit = 3"),
        ("c.train_steps = 250", "c.train_steps = 20"),
        ("c.global_batch = 8192", "c.global_batch = 2048"),
        ("c.micro_batch = 4096", "c.micro_batch = 1024"),
        ("c.eval_every = 100", "c.eval_every = 10"),
        ('f"/tmp/nb2_{name}"', '"{tmp}" + f"/nb2_{name}"'),
        ('"/tmp/nb2_advanced/dashboard.png"',
         '"{tmp}/nb2_advanced/dashboard.png"'),
        ('open("/tmp/nb2_advanced/advanced_tables.jsonl")',
         'open("{tmp}/nb2_advanced/advanced_tables.jsonl")'),
    ],
}


@pytest.mark.parametrize("name", sorted(SHRINK))
def test_notebook_executes(name, tmp_path):
    nb = nbformat.read(NB_DIR / name, as_version=4)
    subs = [(a, b.replace("{tmp}", str(tmp_path))) for a, b in SHRINK[name]]
    hits = {a: 0 for a, _ in subs}
    for cell in nb.cells:
        if cell.cell_type != "code":
            continue
        src = cell.source
        for a, b in subs:
            if a in src:
                hits[a] += 1
                src = src.replace(a, b)
        cell.source = src
    missing = [a for a, k in hits.items() if k == 0]
    assert not missing, f"shrink patterns not found in {name}: {missing}"

    # The kernel is a fresh subprocess: force it onto CPU the same way the
    # root conftest does (the container's sitecustomize registers the TPU
    # plugin programmatically, so the config-level override is required —
    # and the TPU grant is exclusive, tests must never touch it).
    nb.cells.insert(0, nbformat.v4.new_code_cell(
        "import jax\njax.config.update('jax_platforms', 'cpu')"))

    client = nbclient.NotebookClient(
        nb, timeout=420, kernel_name="python3",
        resources={"metadata": {"path": str(NB_DIR)}})
    client.execute()  # raises CellExecutionError on any failing cell
    # Every code cell actually ran.
    for cell in nb.cells:
        if cell.cell_type == "code" and cell.source.strip():
            assert cell.execution_count is not None
