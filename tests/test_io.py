"""I/O layer tests against the reference's bundled data files."""

import numpy as np
import pytest

from is3d2_tpu.config import Config
from is3d2_tpu.io.tables import GaussLaguerre, GaussLegendre, MomentumGrids, load_table
from is3d2_tpu.io.pdg import read_pdg, decode_mcid
from is3d2_tpu.io.surface import read_surface
from is3d2_tpu.io.deltaf_tables import DeltafTables
from is3d2_tpu.constants import hbarC


def test_config_from_reference_file(reference_dir):
    cfg = Config.from_file(reference_dir / "iS3D_parameters.dat")
    assert cfg.operation == 1
    assert cfg.mode == 1
    assert cfg.hrg_eos == 3
    assert cfg.dimension == 2
    assert cfg.df_mode == 4
    assert cfg.include_shear_deltaf == 1
    assert cfg.include_baryon == 0
    assert cfg.deta_min == pytest.approx(1e-5)
    assert cfg.min_num_hadrons == pytest.approx(1e7)
    assert cfg.sampler_seed == 1
    cfg.validate()


def test_gauss_laguerre(reference_dir):
    gla = GaussLaguerre.from_file(reference_dir / "tables/gauss/gla_roots_weights.txt")
    assert gla.roots.shape == (21, 32)
    # family a: integral x^a e^-x dx = a!
    for a, fact in ((0, 1.0), (1, 1.0), (2, 2.0), (3, 6.0)):
        assert gla.weights[a].sum() == pytest.approx(fact, rel=1e-12)


def test_gauss_legendre(reference_dir):
    gl = GaussLegendre.from_file(reference_dir / "tables/gauss/gauss_legendre.dat")
    assert gl.points == 32
    assert gl.weights.sum() == pytest.approx(2.0, rel=1e-10)
    assert np.dot(gl.weights, gl.roots**2) == pytest.approx(2.0 / 3.0, rel=1e-8)


def test_momentum_grids(reference_dir):
    g = MomentumGrids.from_dir(reference_dir / "tables")
    assert g.pT.shape[0] == 51
    assert g.phi.shape[0] == 1
    assert g.phi_weight[0] == pytest.approx(2 * np.pi, rel=1e-8)
    assert g.eta.shape[0] >= 20
    # eta weights integrate ~ a smooth function over full range
    assert g.eta_weight.sum() > 0


def test_pdg_urqmd(reference_dir):
    table = read_pdg(1, reference_dir / "PDG")
    n_b = int((table.baryon > 0).sum())
    n_ab = int((table.baryon < 0).sum())
    assert n_b == n_ab and n_b > 0
    # pion0
    i = table.index_of_mcid(111)
    assert table.mass[i] == pytest.approx(0.138)
    assert table.sign[i] == -1
    assert table.gspin[i] == 1
    # proton is a fermion with baryon 1
    p = table.index_of_mcid(2212)
    assert table.sign[p] == 1 and table.baryon[p] == 1
    # antiproton auto-generated
    ap = table.index_of_mcid(-2212)
    assert table.mass[ap] == table.mass[p]
    assert table.baryon[ap] == -1


def test_pdg_smash_box(reference_dir):
    table = read_pdg(3, reference_dir / "PDG")
    assert len(table) > 100
    n_b = int((table.baryon > 0).sum())
    n_ab = int((table.baryon < 0).sum())
    assert n_b == n_ab
    i = table.index_of_mcid(111)
    assert table.mass[i] == pytest.approx(0.138)
    assert table.baryon[i] == 0 and table.sign[i] == -1
    # charged pions have antiparticles, pi0 does not
    assert (table.mc_id == -211).any()
    assert not (table.mc_id == -111).any()


def test_decode_mcid():
    # proton 2212: baryon, gspin 2, fermion
    info = decode_mcid(2212)
    assert info == {"gspin": 2, "baryon": 1, "sign": 1,
                    "has_antiparticle": True, "is_meson": False, "is_baryon": True}
    # pi+ 211: meson, gspin 1, boson, has antiparticle (nq2 != nq3)
    info = decode_mcid(211)
    assert info["gspin"] == 1 and info["baryon"] == 0 and info["sign"] == -1
    assert info["has_antiparticle"]
    # pi0 111: self-conjugate
    assert not decode_mcid(111)["has_antiparticle"]
    # Delta(1232)++ 2224: gspin 4
    assert decode_mcid(2224)["gspin"] == 4


def test_surface_reader_single_cell(reference_dir):
    # The bundled input/surface.dat appears to carry an extra u^t column;
    # the C++ CPU reader nevertheless parses it positionally
    # (readindata.cpp:219-307).  We match that behavior exactly:
    # col 8 -> ux = 1, col 11 -> E = 0, col 12 -> T = 1.40186/hbarC, ...
    s = read_surface(reference_dir / "input/surface.dat", mode=1, dimension=2,
                     include_baryon=False)
    assert s.n_cells == 1
    assert s.tau[0] == 1.0
    assert s.dat[0] == 100.0
    assert s.ux[0] == 1.0
    assert s.E[0] == 0.0
    assert s.T[0] == pytest.approx(1.40186 * hbarC)
    assert s.P[0] == pytest.approx(0.760295 * hbarC)
    assert s.eta[0] == 0.0

    avg = s.thermo_averages()
    assert avg.temperature == pytest.approx(1.40186 * hbarC)


def test_surface_reader_mode0_legacy(reference_dir):
    # the bundled single-cell surface is really in the legacy GPU-VH format
    # (explicit u^t column, full pi tensor): mode 0 parses it physically
    s = read_surface(reference_dir / "input/surface.dat", mode=0, dimension=2,
                     include_baryon=False)
    assert s.n_cells == 1
    assert s.ux[0] == 0.0 and s.uy[0] == 0.0 and s.un[0] == 0.0
    assert s.E[0] == pytest.approx(1.40186 * hbarC)   # 0.277 GeV/fm^3
    assert s.T[0] == pytest.approx(0.760295 * hbarC)  # 0.150 GeV
    assert s.P[0] == pytest.approx(0.20914 * hbarC)
    # static box: uds = 100, ds.ds = 100^2 -> ds_max = |uds| + 0 = 100
    assert s.ds_max()[0] == pytest.approx(100.0)


def test_deltaf_tables(reference_dir):
    t = DeltafTables.load(3, include_baryon=False,
                          base_dir=reference_dir / "deltaf_coefficients/vh")
    assert t.points_T == 101
    assert t.T_grid[0] == pytest.approx(0.1)
    t1 = DeltafTables.load(1, include_baryon=False,
                           base_dir=reference_dir / "deltaf_coefficients/vh")
    assert t1.betapi[0, 0] == pytest.approx(29.335293)  # head of urqmd/betapi.dat
    t2 = DeltafTables.load(1, include_baryon=True,
                           base_dir=reference_dir / "deltaf_coefficients/vh")
    assert t2.points_muB == 81


def test_chosen_particles(reference_dir):
    table = read_pdg(3, reference_dir / "PDG")
    chosen = load_table(reference_dir / "PDG/chosen_particles.dat")[:, 0].astype(int)
    idx = table.chosen_indices(chosen)
    assert list(table.mc_id[idx]) == list(chosen)


def test_fastio_comment_semantics(tmp_path):
    """The native parser must treat '#'-to-EOL as comments like loadtxt —
    even when the comment contains exactly n_cols numeric tokens (which
    would defeat the token-count-mismatch fallback)."""
    from is3d2_tpu.io.fastio import load_table_fast

    p = tmp_path / "table.dat"
    p.write_text(
        "# 9 9 9\n"              # full-line comment with numerals
        "1.0 2.0 3.0\n"
        "4.0 5.0 6.0 # 7 8 9\n"  # trailing comment with n_cols numerals
        "7.0 8.0 9.0\n")
    out = load_table_fast(p)
    ref = np.loadtxt(p, ndmin=2)
    np.testing.assert_array_equal(out, ref)


def test_surface_reader_mode4_old_music(tmp_path):
    """Mode 4 (old private MUSIC, readindata.cu:551-686): tau-scaled dsigma,
    u^eta and pi^*n columns; P reconstructed as s.T - E; dsigma_eta zeroed
    for boost-invariant surfaces."""
    tau = 2.0
    # tau x y eta | dsig/tau (4) | ut ux uy tau.un | E T muB s | pi (10) | Pi
    row = [tau, 0.5, -0.3, 0.7,
           0.11, 0.02, 0.03, 0.04,
           1.1, 0.2, 0.1, 0.3,
           1.4, 0.76, 0.05, 2.5,
           0.0, 0.0, 0.0, 0.01,
           0.002, 0.003, 0.004, 0.005, 0.006, 0.007,
           -0.02]
    p = tmp_path / "surface.dat"
    p.write_text(" ".join(f"{v:.17g}" for v in row) + "\n")

    s = read_surface(p, mode=4, dimension=2, include_baryon=False)
    assert s.n_cells == 1
    assert s.tau[0] == tau and s.eta[0] == 0.0
    np.testing.assert_allclose(s.dat[0], 0.11 * tau)
    np.testing.assert_allclose(s.dax[0], 0.02 * tau)
    assert s.dan[0] == 0.0                      # zeroed in 2+1d
    np.testing.assert_allclose(s.un[0], 0.3 / tau)
    np.testing.assert_allclose(s.E[0], 1.4 * hbarC)
    np.testing.assert_allclose(s.T[0], 0.76 * hbarC)
    np.testing.assert_allclose(s.muB[0], 0.05 * hbarC)
    np.testing.assert_allclose(s.P[0], 2.5 * (0.76 * hbarC) - 1.4 * hbarC)
    np.testing.assert_allclose(s.pixx[0], 0.002 * hbarC)
    np.testing.assert_allclose(s.pixn[0], 0.004 * hbarC / tau)
    np.testing.assert_allclose(s.piyn[0], 0.006 * hbarC / tau)
    np.testing.assert_allclose(s.bulkPi[0], -0.02 * hbarC)

    s3 = read_surface(p, mode=4, dimension=3, include_baryon=False)
    np.testing.assert_allclose(s3.dan[0], 0.04 * tau)   # kept in 3+1d
    assert s3.eta[0] == 0.7


def test_native_event_writer_roundtrip(tmp_path):
    """The native per-event writer's fast %.Ne formatter must round-trip
    every finite double exactly at precision 16 (17 significant digits) and
    match the reference's file layout (csrc/is3d2_io.cpp format_e;
    EmissionFunction.cpp:674 uses setprecision(16))."""
    from is3d2_tpu.io.fastio import write_events_fast, _get_lib
    if _get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(20000) * 10.0 ** rng.integers(-300, 300, 20000),
        [0.0, -0.0, 1.0, -1.0, 9.999999999999999, 1e-308, 5e-324, 1.7e308,
         np.inf, -np.inf, np.nan, 0.1, 0.125, 1e10, -3.5e-7],
    ])
    n = len(vals)
    # two events to exercise the offsets path
    off = np.array([0, n // 2, n], dtype=np.int64)
    mcid = np.arange(n, dtype=np.int64) - 100
    ok = write_events_fast(str(tmp_path / "pl_%lld.dat"), "n pid v", " ", 16,
                           True, off, mcid, [vals])
    assert ok
    got = []
    for e in (1, 2):
        with open(tmp_path / f"pl_{e}.dat") as fh:
            assert next(fh) == "n pid v\n"
            for i, line in enumerate(fh):
                t = line.split()
                assert int(t[0]) == i            # per-file row counter
                got.append((int(t[1]), t[2]))
    assert len(got) == n
    for i, (pid, tok) in enumerate(got):
        assert pid == i - 100
        v = float(tok)
        x = vals[i]
        if np.isnan(x):
            assert np.isnan(v)
        else:
            assert v == x, f"row {i}: {tok} != {x!r}"


def test_native_continuous_writers_match_python(tmp_path, monkeypatch):
    """The threaded native op-1 writers must produce the same files as the
    Python fallback loops: same parsed values, same blank-line structure."""
    from types import SimpleNamespace
    from is3d2_tpu.io import output
    from is3d2_tpu.io import fastio

    if fastio._get_lib() is None:
        import pytest
        pytest.skip("no native library")

    rng = np.random.default_rng(5)
    S, NpT, Nphi, Ny = 5, 7, 6, 1
    spectra = rng.gamma(2.0, 1.0, size=(S, NpT, Nphi, Ny))
    spectra[0, 2, 3, 0] = 0.0
    grids = SimpleNamespace(
        pT=rng.uniform(0.1, 3.0, NpT), pT_weight=rng.uniform(0.1, 1.0, NpT),
        phi=np.sort(rng.uniform(0, 6.28, Nphi)),
        phi_weight=rng.uniform(0.1, 1.0, Nphi),
        y=np.zeros(1), eta=np.zeros(1), eta_weight=np.ones(1))
    mcids = [211, -321, 2212, 3122, -100211]

    d_nat = tmp_path / "nat"
    d_py = tmp_path / "py"
    writers = (output.write_spectra, output.write_vn,
               output.write_dN_2pipTdpTdy, output.write_dN_dphidy)
    for w in writers:
        w(d_nat, mcids, spectra, grids, 2)
    monkeypatch.setattr(fastio, "write_blocks_fast",
                        lambda *a, **k: False)
    for w in writers:
        w(d_py, mcids, spectra, grids, 2)

    files = sorted(p.relative_to(d_py) for p in d_py.rglob("*.dat"))
    assert len(files) == 4 * len(mcids)
    for rel in files:
        a = (d_nat / rel).read_text()
        b = (d_py / rel).read_text()
        # blank-line structure and row count must match exactly
        assert [len(l.split()) for l in a.splitlines()] \
            == [len(l.split()) for l in b.splitlines()], rel
        va = np.loadtxt(d_nat / rel, skiprows=1 if "pTdpTdphidy" in str(rel) else 0)
        vb = np.loadtxt(d_py / rel, skiprows=1 if "pTdpTdphidy" in str(rel) else 0)
        np.testing.assert_allclose(va, vb, rtol=2e-9, atol=0, err_msg=str(rel))
