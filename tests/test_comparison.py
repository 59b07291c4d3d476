"""Metric-behaviour sweeps: the WD-vs-CD sensitivity evidence.

Reference: ``Comparison_Wasserstein_with_Chamfer_distance/main_rotation.py``
:191-227 + ``main_translation.py`` + the committed WD_vs_CD_graph.ipynb
figure (rotation 0-90 deg per axis, translation range sweep). The thesis
evidence these sweeps must reproduce: exact Wasserstein responds monotonically
and strongly to a growing rigid transform while Chamfer under-reacts at small
offsets.
"""

import numpy as np
import pytest

from shwd_tpu.data.synthetic import shape_bank
from shwd_tpu.train.comparison import (
    gaussian_kl_vs_w2, rotation_sweep, translation_sweep,
)


@pytest.fixture(scope="module")
def clouds():
    # asymmetric objects, like the ModelNet10 test split the reference uses
    return shape_bank(12, 64, seed=0, kinds=("composite",))


def test_rotation_sweep_wd_monotone_and_more_sensitive(clouds):
    angles = np.arange(0.0, 91.0, 15.0)
    r = rotation_sweep(clouds, angles)
    assert np.isfinite(r.chamfer).all() and np.isfinite(r.wasserstein).all()
    # WD grows monotonically with the rotation angle
    assert (np.diff(r.wasserstein) > 0).all()
    # and reacts much more strongly than CD at small angles (the figure's
    # point): at 15 deg WD is already several times CD
    assert r.wasserstein[1] > 3.0 * r.chamfer[1]
    # WD reaches a larger fraction of its 90-deg value early (CD lags)
    assert (r.wasserstein[1] / r.wasserstein[-1]
            > r.chamfer[1] / r.chamfer[-1])


def test_translation_sweep_wd_linear_cd_lags(clouds):
    mags = np.arange(0.0, 1.01, 0.25)
    t = translation_sweep(clouds, mags)
    # exact W2 of a pure translation IS the translation magnitude
    np.testing.assert_allclose(t.wasserstein[1:], mags[1:], rtol=0.1)
    # CD underestimates small offsets
    assert (t.chamfer[1:3] < 0.6 * t.wasserstein[1:3]).all()
    # both monotone
    assert (np.diff(t.wasserstein) > 0).all()
    assert (np.diff(t.chamfer) > 0).all()


def test_sinkhorn_between_entropic_and_exact(clouds):
    mags = np.array([0.0, 0.5, 1.0])
    t = translation_sweep(clouds, mags)
    assert np.isfinite(t.sinkhorn).all()
    # entropic bias keeps Sinkhorn above zero at identity but it must track
    # the growth of the exact distance
    assert t.sinkhorn[-1] > t.sinkhorn[0]


def test_gaussian_kl_vs_w2_closed_form():
    sigma = np.array([1.0, 0.5, 0.25])
    mags = np.linspace(0.0, 2.0, 9)
    t = np.stack([mags, np.zeros_like(mags), np.zeros_like(mags)], -1)
    kl, w2 = gaussian_kl_vs_w2(sigma, t)
    np.testing.assert_allclose(w2, mags)           # W2 linear in |t|
    np.testing.assert_allclose(kl, 0.5 * mags**2)  # KL quadratic (x-axis var 1)


def test_make_figures_smoke(tmp_path):
    """The figure exporter renders every figure whose artifact exists,
    without touching the committed figures directory."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "make_figures",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                     "make_figures.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "figs")
    mod.wd_vs_cd(out, "rotation")
    mod.wd_vs_kl(out)
    mod.robustness(out)
    mod.flow_convergence(out, "cube")   # tolerates rows without curves
    made = sorted(p.name for p in (tmp_path / "figs").glob("*.png"))
    assert "wd_vs_cd_rotation.png" in made
    assert "wd_vs_kl.png" in made
    assert "robustness.png" in made
