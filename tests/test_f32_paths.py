"""compute_dtype='f32' dispatcher paths vs the f64 reference paths."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from surfgen import make_surface, make_eos_consistent

from is3d2_tpu.config import Config
from is3d2_tpu.io.pdg import read_pdg
from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.io.surface import ThermoAverages
from is3d2_tpu.physics.deltaf import DeltafData
from is3d2_tpu.core.spectra import compute_spectra

PIKP = (111, 321, 2212)


@pytest.mark.parametrize("df_mode", [1, 2, 3, 4, 5])
def test_f32_matches_f64(reference_dir, df_mode):
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=77, shear_scale=0.03, bulk_scale=0.01)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species, laguerre)
    plasma = ThermoAverages(0.155, 0.25, 0.08, 0.0, 0.0)

    cfg64 = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                   include_shear_deltaf=1, include_bulk_deltaf=1,
                   cell_block=64, compute_dtype="f64")
    cfg32 = dataclasses.replace(cfg64, compute_dtype="f32")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(species, laguerre, plasma)
    chosen = species.chosen_indices(PIKP)

    a = compute_spectra(surf, species, chosen, grids, df_data, cfg64, laguerre)
    b = compute_spectra(surf, species, chosen, grids, df_data, cfg32, laguerre)

    scale = np.abs(a).max()
    sig = np.abs(a) > 1e-8 * scale
    err = (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[sig].max()
    # f32 compute: exp amplifies rounding of u.p/T (~30 * eps_f32); famod's
    # VAH Newton runs in f64 on device (_reconstruct_f64_jit), so df 5 sits
    # in the same class (measured 4e-6)
    assert err < 2e-5, f"df{df_mode}: f32 vs f64 max rel err {err:.2e}"


@pytest.mark.parametrize("dimension", [2, 3])
def test_polarization_f32_matches_f64(reference_dir, dimension):
    """Polarization fast path (core/polarization_fast.py).

    Two metrics, because the raw spin sums St..Sn cancel across cells (the
    vorticity-weighted summands average near zero), so a plain relative
    error on a near-cancelled bin measures rounding noise, not physics:
      1. Snorm (positive CF weight, no cancellation): relative on
         significant bins, spectra-class bound (measured ~5e-6).
      2. The physical observable P^mu = S^mu/Snorm: absolute error
         normalized by the maximum polarization magnitude over occupied
         bins (measured ~1e-6 in both dimensions)."""
    from is3d2_tpu.core.polarization import compute_polarization

    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    surf = make_surface(48, seed=41, dimension=dimension, vorticity=True)
    plasma = surf.thermo_averages()

    cfg64 = Config(operation=1, mode=5, df_mode=1, hrg_eos=3,
                   dimension=dimension, cell_block=16, compute_dtype="f64")
    cfg32 = dataclasses.replace(cfg64, compute_dtype="f32")
    chosen = species.chosen_indices(PIKP)

    a = compute_polarization(surf, species, chosen, grids, plasma, cfg64)
    b = compute_polarization(surf, species, chosen, grids, plasma, cfg32)

    n64, n32 = a[4], b[4]
    sig = n64 > 1e-6 * n64.max()
    nerr = (np.abs(n32 - n64) / np.maximum(n64, 1e-300))[sig].max()
    assert nerr < 2e-5, f"{dimension}d Snorm: f32 vs f64 rel err {nerr:.2e}"

    good = n64 > 1e-3 * n64.max()
    for name, x64, x32 in zip(("St", "Sx", "Sy", "Sn"), a, b):
        P64 = x64 / np.maximum(n64, 1e-300)
        P32 = x32 / np.maximum(n32, 1e-300)
        pmax = np.abs(P64[good]).max()
        perr = np.abs(P32 - P64)[good].max() / max(pmax, 1e-300)
        assert perr < 1e-5, \
            f"{dimension}d {name}: polarization err {perr:.2e} of max |P| {pmax:.2e}"


@pytest.mark.parametrize("df_mode", [1, 3, 5])
def test_f32_matches_f64_3d(reference_dir, df_mode):
    """3+1d light-cone fast path: f32 vs f64 on per-species significant bins.

    Measured: df 1-4 <= ~7e-6 (the light-cone basis keeps pt/tau*pn sums of
    positives, so the only amplification is exp rounding of u.p/T); famod
    ~1e-5 (the VAH (lambda, aT, aL) Newton runs in f64 on device, leaving
    only the contraction's exp(-E/lambda) rounding)."""
    species = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    laguerre = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    surf = make_surface(48, seed=77, dimension=3, shear_scale=0.03,
                        bulk_scale=0.01)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species, laguerre)

    cfg64 = Config(operation=1, df_mode=df_mode, hrg_eos=3, dimension=3,
                   include_shear_deltaf=1, include_bulk_deltaf=1,
                   cell_block=16, compute_dtype="f64")
    cfg32 = dataclasses.replace(cfg64, compute_dtype="f32")
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    chosen = species.chosen_indices(PIKP)

    a = compute_spectra(surf, species, chosen, grids, df_data, cfg64, laguerre)
    b = compute_spectra(surf, species, chosen, grids, df_data, cfg32, laguerre)

    scale_s = np.abs(a).max(axis=(1, 2, 3), keepdims=True)
    sig = np.abs(a) > 1e-6 * scale_s
    err = (np.abs(b - a) / np.maximum(np.abs(a), 1e-300))[sig].max()
    bound = 2e-5 if df_mode != 5 else 3e-5
    assert err < bound, f"3+1d df{df_mode}: f32 vs f64 max rel err {err:.2e}"
