"""1-D energy distance parity + toy-baselines example smoke tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from otgan_tpu.ops.energy import energy_distance, weight_decay


def _np_energy(f_sample, f_data):
    """Numpy transcription of the reference semantics (utils/nn.py:6-17)."""
    grads = np.zeros_like(f_sample)
    for j in range(f_sample.shape[1]):
        si = np.argsort(f_sample[:, j])
        di = np.argsort(f_data[:, j])
        grads[si, j] = f_sample[si, j] - f_data[di, j]
    return float(np.mean(grads**2)), grads


def test_energy_distance_parity():
    rng = np.random.default_rng(0)
    fs = rng.standard_normal((64, 8)).astype(np.float32)
    fd = rng.standard_normal((64, 8)).astype(np.float32)
    want_loss, want_grads = _np_energy(fs, fd)
    loss, grads = energy_distance(jnp.asarray(fs), jnp.asarray(fd))
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), want_grads, atol=1e-6)


def test_energy_distance_identical_inputs_zero():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32)
    loss, grads = energy_distance(f, f)
    assert float(loss) < 1e-12
    np.testing.assert_allclose(np.asarray(grads), 0.0, atol=1e-7)


def test_weight_decay_matrices_only():
    params = {
        "w": jnp.ones((2, 3)),  # counted: 6
        "b": jnp.ones((4,)),  # skipped (ndim < 2)
        "k": jnp.full((2, 1, 1, 2), 2.0),  # counted: 4 * 4 = 16
    }
    assert float(weight_decay(params)) == 22.0


def test_toy_baselines_smoke():
    """Each objective runs a few steps without blowing up."""
    from examples.toy_baselines import main

    for model in ("med_gan", "gan", "dan_s", "dan_energy"):
        gp, dp = main(
            [
                "--model", model,
                "--steps", "4",
                "--batch_size", "32",
                "--save_dir", "/tmp/toy_baselines_test",
            ]
        )
        for p in gp:
            assert np.all(np.isfinite(np.asarray(p["w"])))


def test_toy_notebooks_valid_and_consistent():
    """The notebook mirrors of the reference's toy_example/*.ipynb must be
    valid nbformat-4 JSON, and every symbol their code cells import from
    this repo must actually exist (no execution — the heavy math they run
    is covered by test_toy_baselines_smoke / test_toy_e2e)."""
    import importlib
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("med_gan_toy_example1.ipynb", "med_gan_toy_example2.ipynb"):
        nb = json.load(open(os.path.join(here, "examples", name)))
        assert nb["nbformat"] == 4
        code = "\n".join(
            "".join(c["source"])
            for c in nb["cells"]
            if c["cell_type"] == "code"
        )
        assert "jax" in code and "mode_coverage" in code
        # join parenthesized multi-line imports onto one line
        code = re.sub(
            r"\(([^)]*)\)", lambda m: "(" + m.group(1).replace("\n", " ") + ")",
            code,
        )
        for m in re.finditer(
            r"^from ((?:otgan_tpu|examples)\.[\w.]+) import (.+)$",
            code,
            re.M,
        ):
            mod = importlib.import_module(m.group(1))
            names = re.sub(r"[()\\\n]", " ", m.group(2))
            for sym in [s.strip() for s in names.split(",") if s.strip()]:
                assert hasattr(mod, sym), f"{name}: {m.group(1)}.{sym}"


def test_kde_evolution_plot(tmp_path):
    import numpy as np

    from otgan_tpu.utils.plotting import kde_evolution_plot

    rng = np.random.default_rng(0)
    snaps = [
        (500, rng.standard_normal((300, 2))),
        (1000, rng.standard_normal((300, 2)) + 2.0),
        (1500, np.zeros((300, 2))),  # collapsed -> singular KDE handled
    ]
    path = str(tmp_path / "kde.png")
    kde_evolution_plot(snaps, path)
    import os

    assert os.path.getsize(path) > 1000


@pytest.mark.slow
def test_notebook_mirrors_execute(monkeypatch):
    """EXECUTE every code cell of both notebook mirrors (VERDICT r04 weak
    #7: structure checks let behavior rot — wrong arg names survive). A
    tiny OTGAN_NB_STEPS makes the runs CI-sized; the cells' own artifacts
    (/tmp/*_kde.png) must appear and the final namespaces hold the
    objects the closing cells computed. Matches the reference's de-facto
    integration tests (toy_example/med_gan_toy_example{1,2}.ipynb,
    SURVEY.md section 4)."""
    import json

    monkeypatch.setenv("OTGAN_NB_STEPS", "24")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, check in (
        (
            "med_gan_toy_example1.ipynb",
            lambda ns: set(ns["runs"]) == {"gan", "dan_s", "dan_energy"},
        ),
        (
            "med_gan_toy_example2.ipynb",
            lambda ns: len(ns["snaps"]) >= 1
            and np.isfinite(float(ns["dist"])),
        ),
    ):
        nb = json.load(open(os.path.join(here, "examples", name)))
        ns: dict = {"__name__": "__main__"}
        for i, cell in enumerate(nb["cells"]):
            if cell["cell_type"] != "code":
                continue
            code = compile("".join(cell["source"]), f"{name}:cell{i}", "exec")
            exec(code, ns)  # any cell error fails the test with its cell id
        assert check(ns), name
    for png in ("gan", "dan_s", "dan_energy", "med_gan"):
        assert os.path.exists(f"/tmp/{png}_kde.png")
