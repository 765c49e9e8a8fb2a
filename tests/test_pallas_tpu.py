"""On-silicon Pallas kernel parity tests (opt-in: IS3D2_TPU_TESTS=1).

The regular suite runs on the CPU backend (tests/conftest.py forces it),
where Pallas executes in interpret mode.  These tests compile the Mosaic
kernels for the real TPU and compare against the XLA fast paths on the
same chip.  Run them directly (NOT under the CPU-forcing conftest):

    IS3D2_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -x -q

They are skipped in the normal suite both by the env gate and because the
conftest's CPU backend would make them interpret-mode duplicates of
tests/test_pallas_kernel.py.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

pytestmark = pytest.mark.skipif(
    not os.environ.get("IS3D2_TPU_TESTS"),
    reason="on-silicon Pallas tests are opt-in (IS3D2_TPU_TESTS=1)")

PIKP = (111, 321, 2212)


def _is_tpu():
    import jax
    return jax.devices()[0].platform != "cpu"


def _setup(df_mode, reference_dir):
    from surfgen import make_surface, make_eos_consistent
    from is3d2_tpu.config import Config
    from is3d2_tpu.io.pdg import read_pdg
    from is3d2_tpu.io.tables import GaussLaguerre, MomentumGrids
    from is3d2_tpu.io.deltaf_tables import DeltafTables
    from is3d2_tpu.io.surface import ThermoAverages
    from is3d2_tpu.physics.deltaf import DeltafData
    from is3d2_tpu.core.cells import prepare_cells
    from is3d2_tpu.core.spectra import SpeciesArrays, MomentumGridDevice

    species_t = read_pdg(3, reference_dir / "PDG")
    grids = MomentumGrids.from_dir(reference_dir / "tables")
    tables = DeltafTables.load(3, include_baryon=False,
                               base_dir=reference_dir / "deltaf_coefficients/vh")
    laguerre = GaussLaguerre.from_file(
        reference_dir / "tables/gauss/gla_roots_weights.txt")
    surf = make_surface(128, seed=29, shear_scale=0.03, bulk_scale=0.01)
    cfg = Config(operation=1, df_mode=df_mode, hrg_eos=3,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 cell_block=128)
    if df_mode == 5:
        surf = make_eos_consistent(surf, species_t, laguerre)
    df_data = DeltafData(tables, df_mode, include_baryon=False)
    if df_mode == 4:
        df_data.compute_jonah_coefficients(
            species_t, laguerre, ThermoAverages(0.155, 0.25, 0.08, 0.0, 0.0))
    chosen = species_t.chosen_indices(PIKP)
    cells = prepare_cells(surf, cfg, block=128)
    species = SpeciesArrays.from_table(species_t, chosen)
    grid = MomentumGridDevice.from_grids(grids, cfg.dimension)
    return (species_t, cfg, df_data, laguerre, chosen, cells, species, grid)


def _rel_err(a, ref):
    scale = np.abs(ref).max()
    sig = np.abs(ref) > 1e-10 * scale
    return (np.abs(a - ref) / np.maximum(np.abs(ref), 1e-300))[sig].max()


@pytest.mark.parametrize("df_mode", [1, 2])
def test_pallas_tpu_df12(reference_dir, df_mode):
    from is3d2_tpu.core.spectra import df12_cell_coefficients
    from is3d2_tpu.core.spectra_fast import compute_spectra_fast
    from is3d2_tpu.ops.spectra_fast_common import compute_spectra_pallas
    import jax.numpy as jnp

    if not _is_tpu():
        pytest.skip("no TPU device")
    (_, cfg, df_data, _, _, cells, species, grid) = _setup(
        df_mode, reference_dir)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    ref = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                          n_blocks=1,
                                          compute_dtype=jnp.float32))
    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid,
                                            cfg, c_tile=128, m_tile=512,
                                            interpret=False))
    err = _rel_err(out, ref)
    assert err < 1e-4, f"on-TPU pallas df{df_mode} err {err:.2e}"


@pytest.mark.parametrize("df_mode", [3, 4, 5])
def test_pallas_tpu_feqmod(reference_dir, df_mode):
    from is3d2_tpu.core.feqmod import prepare_feqmod
    from is3d2_tpu.core.spectra_famod import prepare_famod
    from is3d2_tpu.core.spectra_feqmod_fast import compute_spectra_feqmod_fast
    from is3d2_tpu.ops.cooper_frye_feqmod_pallas import (
        compute_spectra_feqmod_pallas)

    if not _is_tpu():
        pytest.skip("no TPU device")
    (species_t, cfg, df_data, laguerre, chosen, cells, species,
     grid) = _setup(df_mode, reference_dir)
    if df_mode == 5:
        prep = prepare_famod(cells, species_t, cfg)
    else:
        prep = prepare_feqmod(cells, species, df_data, cfg, laguerre)
    ref = np.asarray(compute_spectra_feqmod_fast(cells, prep, species, grid,
                                                 cfg))
    out = np.asarray(compute_spectra_feqmod_pallas(
        cells, prep, species, grid, cfg, c_tile=128, m_tile=512,
        interpret=False))
    err = _rel_err(out, ref)
    assert err < 1e-4, f"on-TPU pallas feqmod df{df_mode} err {err:.2e}"


@pytest.mark.parametrize("df_mode", [1, 2])
def test_pallas_tpu_comp_accuracy_bar(reference_dir, df_mode):
    """The compensated-argument kernel (dot_impl="comp") on silicon vs the
    f32c XLA path (the <=1e-6 golden-tested carrier).  Both sides are
    <=1e-6 of the f64 truth, so their mutual distance must stay <=2e-6 --
    this checks the real bf16 MXU rounding of the comp kernel's 2-pass
    split cell reduction and the Mosaic lowering of the unrolled TwoSum
    chains, which interpret mode cannot."""
    from is3d2_tpu.core.spectra import df12_cell_coefficients
    from is3d2_tpu.core.spectra_fast import compute_spectra_fast
    from is3d2_tpu.ops.spectra_fast_common import compute_spectra_pallas

    if not _is_tpu():
        pytest.skip("no TPU device")
    (_, cfg, df_data, _, _, cells, species, grid) = _setup(
        df_mode, reference_dir)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    ref = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                          n_blocks=1,
                                          compute_dtype="f32c"))
    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid,
                                            cfg, c_tile=128, m_tile=512,
                                            interpret=False,
                                            dot_impl="comp"))
    err = _rel_err(out, ref)
    assert err < 2e-6, f"on-TPU pallas comp df{df_mode} err {err:.2e}"


def test_pallas_tpu_split_dot(reference_dir):
    """The 2/3-pass exact-bf16-split dots (dot_impl="split") on silicon:
    real bf16 MXU rounding, parity vs the XLA fast path.  The split halves
    the HIGHEST dots' MXU passes on the linear contractions (24 -> ~14 per
    eta step); the sweep tool (tools/pallas_sweep.py) measures whether that
    closes the 3-13% XLA gap."""
    from is3d2_tpu.core.spectra import df12_cell_coefficients
    from is3d2_tpu.core.spectra_fast import compute_spectra_fast
    from is3d2_tpu.ops.spectra_fast_common import compute_spectra_pallas
    import jax.numpy as jnp

    if not _is_tpu():
        pytest.skip("no TPU device")
    (_, cfg, df_data, _, _, cells, species, grid) = _setup(1, reference_dir)
    coeffs = df12_cell_coefficients(cells, df_data, cfg)
    ref = np.asarray(compute_spectra_fast(cells, coeffs, species, grid, cfg,
                                          n_blocks=1,
                                          compute_dtype=jnp.float32))
    out = np.asarray(compute_spectra_pallas(cells, coeffs, species, grid,
                                            cfg, c_tile=128, m_tile=512,
                                            interpret=False,
                                            dot_impl="split"))
    err = _rel_err(out, ref)
    assert err < 1e-4, f"on-TPU pallas split-dot err {err:.2e}"
