"""Pallas network-region kernel vs the plain XLA elementwise path.

Both paths execute the SAME network_update source
(grackle_tpu/ops/network.py; reference region
solve_rate_cool_g.F:554-813), so they can differ only by float-op
scheduling (fusion / FMA formation).  Measured on CPU: <= a few f32
ULPs per subcycle (~1e-6 relative); over a long stiff subcycle
sequence that noise amplifies chaotically, so the contract tested here
is per-step closeness + identical convergence behavior, not multi-step
bit identity.

These tests run the kernel in Pallas interpreter mode (the CPU suite
has no Mosaic); the TPU-compiled path is exercised by bench.py and the
hardware runs recorded in docs/Performance.md.
"""


import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.ops import network_kernel
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def _make_chem(chem=3, **kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = chem
    cd.precision = 32
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kw.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def _state(cd, n, seed=11):
    rng = np.random.RandomState(seed)
    tiny = 1e-20
    f = {"density": 10.0 ** rng.uniform(-1, 3, n).astype(np.float32)}
    f["energy"] = (
        10.0 ** rng.uniform(3.2, 6.0, n) / 1.0e4 / 0.8
    ).astype(np.float32)
    if cd.primordial_chemistry > 0:
        f["HI"] = 0.5 * 0.76 * f["density"]
        f["HII"] = 0.5 * 0.76 * f["density"]
        f["HeI"] = 0.24 * f["density"]
        for k in ["HeII", "HeIII"]:
            f[k] = np.full(n, tiny, np.float32)
        f["de"] = f["HII"].copy()
    if cd.primordial_chemistry > 1:
        for k in ["HM", "H2II"]:
            f[k] = np.full(n, tiny, np.float32)
        f["H2I"] = (1e-5 * f["density"]).astype(np.float32)
    if cd.primordial_chemistry > 2:
        f["DI"] = (2e-5 * f["HI"]).astype(np.float32)
        f["DII"] = (2e-5 * f["HII"]).astype(np.float32)
        f["HDI"] = np.full(n, tiny, np.float32)
    return f


def _solve_both(monkeypatch, cd_kw, dt, n=2048, extra_fields=None,
                chem=3):
    """Solve once with the kernel (interpret mode) and once without."""
    f = _state(_make_chem(chem=chem, **cd_kw), n)
    if extra_fields:
        f.update(extra_fields(n))
    monkeypatch.delenv("GTPU_NETWORK_KERNEL", raising=False)
    out_d, diag_d = _make_chem(chem=chem, **cd_kw).solve_chemistry(
        dict(f), dt)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "interpret")
    out_k, diag_k = _make_chem(chem=chem, **cd_kw).solve_chemistry(
        dict(f), dt)
    return out_d, diag_d, out_k, diag_k


# dt small enough that every cell converges in a couple of subcycles:
# per-step agreement is the kernel's actual contract (ULP noise cannot
# yet amplify), and convergence bookkeeping must match exactly.
_DT_SHORT = 1.0e-12


@pytest.mark.parametrize("chem,kw", [
    (0, {}),
    (1, {}),
    (2, {}),
    (3, {}),
    (3, dict(h2_on_dust=1, metal_cooling=0)),
])
def test_kernel_matches_direct_per_step(monkeypatch, data_file, chem, kw):
    if chem == 0:
        kw = dict(kw, grackle_data_file=data_file)
    out_d, diag_d, out_k, diag_k = _solve_both(
        monkeypatch, kw, _DT_SHORT, chem=chem)
    assert int(np.asarray(diag_d["n_iterations"])) == \
        int(np.asarray(diag_k["n_iterations"]))
    assert np.array_equal(np.asarray(diag_d["cell_iterations"]),
                          np.asarray(diag_k["cell_iterations"]))
    for key in out_d:
        a = np.asarray(out_d[key])
        b = np.asarray(out_k[key])
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-30)
        assert np.max(rel) < 1e-4, (key, float(np.max(rel)))


def test_kernel_rt_path(monkeypatch):
    def rt_fields(n):
        return {
            "RT_heating_rate": np.full(n, 1.0e-28, np.float32),
            "RT_HI_ionization_rate": np.full(n, 1.0e-12, np.float32),
            "RT_HeI_ionization_rate": np.full(n, 1.0e-13, np.float32),
            "RT_HeII_ionization_rate": np.full(n, 1.0e-14, np.float32),
            "RT_H2_dissociation_rate": np.full(n, 1.0e-12, np.float32),
        }

    out_d, diag_d, out_k, diag_k = _solve_both(
        monkeypatch, dict(use_radiative_transfer=1), _DT_SHORT,
        extra_fields=rt_fields)
    assert int(np.asarray(diag_d["n_iterations"])) == \
        int(np.asarray(diag_k["n_iterations"]))
    for key in out_d:
        a, b = np.asarray(out_d[key]), np.asarray(out_k[key])
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-30)
        assert np.max(rel) < 1e-4, (key, float(np.max(rel)))


def test_long_solve_converges_identically(monkeypatch):
    """Over many subcycles ULP noise amplifies in the trace species, but
    both paths must converge (same physics, same bookkeeping) and agree
    in the bulk to f32-solver accuracy class."""
    out_d, diag_d, out_k, diag_k = _solve_both(monkeypatch, {}, 1.0e-4)
    assert np.all(np.asarray(diag_k["converged"]))
    assert np.all(np.asarray(diag_d["converged"]))
    for key in ["HI", "HII", "de", "energy", "HeI", "HeII"]:
        a, b = np.asarray(out_d[key]), np.asarray(out_k[key])
        # median tracks the bulk; the max is chaotic-cell noise
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-30)
        assert np.median(rel) < 1e-4, (key, float(np.median(rel)))


def test_gate_alignment_and_mode(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.delenv("GTPU_NETWORK_KERNEL", raising=False)
    # auto: off on CPU
    assert not network_kernel.kernel_requested(2048, jnp.float32)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "interpret")
    assert network_kernel.kernel_requested(2048, jnp.float32)
    # unaligned N falls back even when forced
    assert not network_kernel.kernel_requested(2047, jnp.float32)
    # f64 never uses the kernel
    assert not network_kernel.kernel_requested(2048, jnp.float64)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "0")
    assert not network_kernel.kernel_requested(2048, jnp.float32)


def test_unaligned_n_still_solves(monkeypatch):
    """A forced kernel with an unaligned cell count silently uses the
    direct path (bit-identical to kernel off)."""
    cd_kw = {}
    f = _state(_make_chem(**cd_kw), 1000)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "interpret")
    out_k, _ = _make_chem(**cd_kw).solve_chemistry(dict(f), _DT_SHORT)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "0")
    out_d, _ = _make_chem(**cd_kw).solve_chemistry(dict(f), _DT_SHORT)
    for key in out_d:
        assert np.array_equal(np.asarray(out_d[key]),
                              np.asarray(out_k[key])), key
