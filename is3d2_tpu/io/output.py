"""Result writers with reference-compatible file formats and naming.

Mirrors the writers in EmissionFunction.cpp:406-975 so the reference's own
analysis/comparison scripts run unmodified on our outputs:

  results/continuous/dN_pTdpTdphidy_<mcid>.dat      (y phip pT value)
  results/continuous/vn_<mcid>.dat                  (y pT v1..v7)
  results/continuous/dN_2pipTdpTdy_<mcid>.dat
  results/continuous/dN_dphidy_<mcid>.dat
  results/continuous/dN_dy_<mcid>.dat
  results/continuous/dN_taudtaudy_<mcid>.dat  (operation 0)
  results/continuous/dN_2pirdrdy_<mcid>.dat
  results/continuous/dN_dphidy_<mcid>.dat
  results/St.dat Sx.dat Sy.dat Sn.dat               (polarization)
  results/sampled/<obs>/..._test.dat                (sampler tests)
  results/particle_list_osc_<n>.dat                 (OSCAR)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import Config
from ..constants import two_pi
from ..io.tables import MomentumGrids


def _ensure(path: Path) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    return path


def write_spectra(results_dir: Path, mcids, spectra: np.ndarray,
                  grids: MomentumGrids, dimension: int) -> None:
    """dN_pTdpTdphidy_<mcid>.dat (EmissionFunction.cpp:406-440).

    The threaded native block writer formats the ~450 species x
    (Ny*Nphi*NpT)-row files (the Python f-string loop it replaced cost
    seconds per op-1 run on the 1-core host); the loop below is the
    no-compiler fallback."""
    from .fastio import write_blocks_fast

    S, NpT, Nphi, Ny = spectra.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    d = _ensure(results_dir / "continuous" / "x").parent
    rows = Ny * Nphi * NpT
    y_c = np.repeat(y_vals, Nphi * NpT)
    phi_c = np.tile(np.repeat(grids.phi, NpT), Ny)
    pT_c = np.tile(grids.pT, Ny * Nphi)
    vals = np.asarray(spectra).transpose(0, 3, 2, 1).reshape(S, rows)
    offsets = np.arange(S + 1, dtype=np.int64) * rows
    cols = [np.tile(y_c, S), np.tile(phi_c, S), np.tile(pT_c, S),
            vals.ravel()]
    if write_blocks_fast(str(d / "dN_pTdpTdphidy_%lld.dat"), list(mcids),
                         "y\tphip\tpT\tdN_pTdpTdphidy", "\t", 8, offsets,
                         cols, blank_every=NpT, blank_tail=1):
        return
    for i, mcid in enumerate(mcids):
        f = _ensure(results_dir / "continuous" / f"dN_pTdpTdphidy_{mcid}.dat")
        with open(f, "w") as fh:
            fh.write("y\tphip\tpT\tdN_pTdpTdphidy\n")
            for iy in range(Ny):
                for iphi in range(Nphi):
                    for ipT in range(NpT):
                        fh.write(f"{y_vals[iy]:.8e}\t{grids.phi[iphi]:.8e}\t"
                                 f"{grids.pT[ipT]:.8e}\t"
                                 f"{spectra[i, ipT, iphi, iy]:.8e}\n")
                    fh.write("\n")


def write_vn(results_dir: Path, mcids, spectra: np.ndarray,
             grids: MomentumGrids, dimension: int, k_max: int = 7) -> None:
    """vn_<mcid>.dat (EmissionFunction.cpp:804-878)."""
    S, NpT, Nphi, Ny = spectra.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    w = grids.phi_weight
    cos_k = np.stack([np.cos((k + 1) * grids.phi) for k in range(k_max)])
    sin_k = np.stack([np.sin((k + 1) * grids.phi) for k in range(k_max)])

    # vectorized vn over (S, NpT, Ny): den/re/im are phi contractions
    sp_all = np.asarray(spectra)
    wsp = w[None, None, :, None] * sp_all                      # (S,NpT,Nphi,Ny)
    den = wsp.sum(axis=2)                                      # (S,NpT,Ny)
    re = np.einsum("kf,spfy->kspy", cos_k, wsp)
    im = np.einsum("kf,spfy->kspy", sin_k, wsp)
    vns = np.where(den[None] < 1e-15, 0.0,
                   np.hypot(re, im) / np.maximum(den[None], 1e-300))

    from .fastio import write_blocks_fast
    d = _ensure(results_dir / "continuous" / "x").parent
    rows = Ny * NpT
    y_c = np.tile(np.repeat(y_vals, NpT), S)
    pT_c = np.tile(grids.pT, Ny * S)
    cols = [y_c, pT_c] + [vns[k].transpose(0, 2, 1).reshape(-1)
                          for k in range(k_max)]
    offsets = np.arange(S + 1, dtype=np.int64) * rows
    if write_blocks_fast(str(d / "vn_%lld.dat"), list(mcids), "", "\t", 8,
                         offsets, cols, blank_every=NpT, blank_tail=1):
        return
    for i, mcid in enumerate(mcids):
        f = _ensure(results_dir / "continuous" / f"vn_{mcid}.dat")
        with open(f, "w") as fh:
            for iy in range(Ny):
                for ipT in range(NpT):
                    row = "\t".join(f"{vns[k, i, ipT, iy]:.8e}"
                                    for k in range(k_max))
                    fh.write(f"{y_vals[iy]:.8e}\t{grids.pT[ipT]:.8e}\t{row}\n")
                fh.write("\n")


def write_dN_2pipTdpTdy(results_dir: Path, mcids, spectra, grids, dimension):
    from .fastio import write_blocks_fast

    S, NpT, Nphi, Ny = spectra.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    vals = np.einsum("f,spfy->spy", grids.phi_weight,
                     np.asarray(spectra)) / two_pi          # (S,NpT,Ny)
    d = _ensure(results_dir / "continuous" / "x").parent
    rows = Ny * NpT
    cols = [np.tile(np.repeat(y_vals, NpT), S), np.tile(grids.pT, Ny * S),
            vals.transpose(0, 2, 1).reshape(-1)]
    offsets = np.arange(S + 1, dtype=np.int64) * rows
    if write_blocks_fast(str(d / "dN_2pipTdpTdy_%lld.dat"), list(mcids),
                         "", "\t", 8, offsets, cols, blank_every=NpT,
                         blank_tail=0):
        return
    for i, mcid in enumerate(mcids):
        f = _ensure(results_dir / "continuous" / f"dN_2pipTdpTdy_{mcid}.dat")
        with open(f, "w") as fh:
            for iy in range(Ny):
                for ipT in range(NpT):
                    fh.write(f"{y_vals[iy]:.8e}\t{grids.pT[ipT]:.8e}\t"
                             f"{vals[i, ipT, iy]:.8e}\n")
                if iy < Ny - 1:
                    fh.write("\n")


def write_dN_dphidy(results_dir: Path, mcids, spectra, grids, dimension):
    from .fastio import write_blocks_fast

    S, NpT, Nphi, Ny = spectra.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    vals = np.einsum("p,spfy->sfy", grids.pT_weight,
                     np.asarray(spectra))                    # (S,Nphi,Ny)
    d = _ensure(results_dir / "continuous" / "x").parent
    rows = Ny * Nphi
    cols = [np.tile(np.repeat(y_vals, Nphi), S), np.tile(grids.phi, Ny * S),
            vals.transpose(0, 2, 1).reshape(-1)]
    offsets = np.arange(S + 1, dtype=np.int64) * rows
    if write_blocks_fast(str(d / "dN_dphidy_%lld.dat"), list(mcids),
                         "", "\t", 8, offsets, cols, blank_every=Nphi,
                         blank_tail=0):
        return
    for i, mcid in enumerate(mcids):
        f = _ensure(results_dir / "continuous" / f"dN_dphidy_{mcid}.dat")
        with open(f, "w") as fh:
            for iy in range(Ny):
                for iphi in range(Nphi):
                    fh.write(f"{y_vals[iy]:.8e}\t{grids.phi[iphi]:.8e}\t"
                             f"{vals[i, iphi, iy]:.8e}\n")
                if iy < Ny - 1:
                    fh.write("\n")


def write_dN_dy(results_dir: Path, mcids, spectra, grids, dimension):
    S, NpT, Nphi, Ny = spectra.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    for i, mcid in enumerate(mcids):
        f = _ensure(results_dir / "continuous" / f"dN_dy_{mcid}.dat")
        with open(f, "w") as fh:
            for iy in range(Ny):
                val = float((grids.phi_weight[None, :]
                             * grids.pT_weight[:, None]
                             * spectra[i, :, :, iy]).sum())
                fh.write(f"{y_vals[iy]:.8f}\t{val:.8f}\n")


def write_dN_dX(results_dir: Path, mcids, dX, cfg: Config):
    """Spacetime distributions (SpacetimeDistribution.cpp:448-496)."""
    tau_n, r_n, phi_n = dX.normalized(cfg)
    for i, mcid in enumerate(mcids):
        with open(_ensure(results_dir / "continuous" / f"dN_taudtaudy_{mcid}.dat"), "w") as fh:
            for j, t in enumerate(dX.tau_mid):
                fh.write(f"{t:.6e}\t{tau_n[i, j]:.6e}\n")
        with open(_ensure(results_dir / "continuous" / f"dN_2pirdrdy_{mcid}.dat"), "w") as fh:
            for j, r in enumerate(dX.r_mid):
                fh.write(f"{r:.6e}\t{r_n[i, j]:.6e}\n")
        with open(_ensure(results_dir / "continuous" / f"dN_dphidy_{mcid}.dat"), "w") as fh:
            for j, p in enumerate(dX.phi_mid):
                fh.write(f"{p:.6e}\t{phi_n[i, j]:.6e}\n")


def write_polarization(results_dir: Path, St, Sx, Sy, Sn, Snorm, grids,
                       dimension: int):
    """St/Sx/Sy/Sn.dat with S^mu/Snorm (EmissionFunction.cpp:561-609).

    Unlike the reference we use one consistent (ipart, pT, phi, y) layout for
    both accumulation and writing."""
    S, NpT, Nphi, Ny = St.shape
    y_vals = grids.y if dimension == 3 else np.zeros(1)
    comps = {"St": St, "Sx": Sx, "Sy": Sy, "Sn": Sn}
    for name, arr in comps.items():
        with open(_ensure(results_dir / f"{name}.dat"), "w") as fh:
            for i in range(S):
                for iy in range(Ny):
                    for iphi in range(Nphi):
                        for ipT in range(NpT):
                            val = arr[i, ipT, iphi, iy] / Snorm[i, ipT, iphi, iy]
                            fh.write(f"{y_vals[iy]:.8e}\t{grids.phi[iphi]:.8e}\t"
                                     f"{grids.pT[ipT]:.8e}\t{val:.8e}\n")
                        fh.write("\n")


# ----------------------------------------------------------------------
# sampled outputs
# ----------------------------------------------------------------------

def write_sampled_histograms(results_dir: Path, mcids, hist, cfg: Config):
    """Event-averaged sampler-test distributions
    (EmissionFunction.cpp:685-975)."""
    nev = hist.n_events
    y_w = 2.0 * cfg.y_cut / cfg.y_bins
    eta_w = 2.0 * cfg.eta_cut / cfg.eta_bins
    pT_w = (cfg.pT_max - cfg.pT_min) / cfg.pT_bins
    phip_w = two_pi / cfg.phip_bins
    tau_w = (cfg.tau_max - cfg.tau_min) / cfg.tau_bins
    r_w = (cfg.r_max - cfg.r_min) / cfg.r_bins

    y_mid = -cfg.y_cut + y_w * (np.arange(cfg.y_bins) + 0.5)
    eta_mid = -cfg.eta_cut + eta_w * (np.arange(cfg.eta_bins) + 0.5)
    pT_mid = cfg.pT_min + pT_w * (np.arange(cfg.pT_bins) + 0.5)
    phip_mid = phip_w * (np.arange(cfg.phip_bins) + 0.5)
    tau_mid = cfg.tau_min + tau_w * (np.arange(cfg.tau_bins) + 0.5)
    r_mid = cfg.r_min + r_w * (np.arange(cfg.r_bins) + 0.5)

    for i, mcid in enumerate(mcids):
        with open(_ensure(results_dir / "sampled/dN_dy" / f"dN_dy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.y_bins):
                fh.write(f"{y_mid[j]:.6f}\t{hist.dN_dy[i, j] / (y_w * nev):.6f}\n")
        with open(_ensure(results_dir / "sampled/dN_dy" / f"dN_dy_{mcid}_average_test.dat"), "w") as fh:
            fh.write(f"{hist.dN_dy[i].sum() / (2.0 * cfg.y_cut * nev):.6f}\n")
        with open(_ensure(results_dir / "sampled/dN_deta" / f"dN_deta_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.eta_bins):
                fh.write(f"{eta_mid[j]:.6f}\t{hist.dN_deta[i, j] / (eta_w * nev):.6f}\n")
        with open(_ensure(results_dir / "sampled/dN_2pipTdpTdy" / f"dN_2pipTdpTdy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.pT_bins):
                val = hist.dN_2pipTdpTdy[i, j] / (two_pi * 2.0 * cfg.y_cut * pT_w * pT_mid[j] * nev)
                fh.write(f"{pT_mid[j]:.6e}\t{val:.6e}\n")
        with open(_ensure(results_dir / "sampled/dN_dphipdy" / f"dN_dphipdy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.phip_bins):
                val = hist.dN_dphipdy[i, j] / (2.0 * cfg.y_cut * phip_w * nev)
                fh.write(f"{phip_mid[j]:.6e}\t{val:.6e}\n")
        with open(_ensure(results_dir / "sampled/vn" / f"vn_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.pT_bins):
                cnt = hist.pT_count[i, j]
                row = [f"{pT_mid[j]:.6e}"]
                for k in range(hist.vn_real.shape[0]):
                    v = np.hypot(hist.vn_real[k, i, j], hist.vn_imag[k, i, j]) / cnt \
                        if cnt > 0 else 0.0
                    row.append(f"{v:.6e}")
                fh.write("\t".join(row) + "\n")
        with open(_ensure(results_dir / "sampled/dN_taudtaudy" / f"dN_taudtaudy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.tau_bins):
                val = hist.dN_taudtaudy[i, j] / (tau_mid[j] * tau_w * nev * 2.0 * cfg.y_cut)
                fh.write(f"{tau_mid[j]:.6e}\t{val:.6e}\n")
        with open(_ensure(results_dir / "sampled/dN_2pirdrdy" / f"dN_2pirdrdy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.r_bins):
                val = hist.dN_2pirdrdy[i, j] / (two_pi * r_mid[j] * r_w * nev * 2.0 * cfg.y_cut)
                fh.write(f"{r_mid[j]:.6e}\t{val:.6e}\n")
        with open(_ensure(results_dir / "sampled/dN_dphisdy" / f"dN_dphisdy_{mcid}_test.dat"), "w") as fh:
            for j in range(cfg.phip_bins):
                val = hist.dN_dphisdy[i, j] / (phip_w * nev * 2.0 * cfg.y_cut)
                fh.write(f"{phip_mid[j]:.6e}\t{val:.6e}\n")


def _sort_by_event(particles, n_events: int):
    """One argsort of the kept rows by event id -> (order, offsets).

    Replaces the O(n_events * capacity) per-event mask scans: event e owns
    rows order[offsets[e]:offsets[e+1]]."""
    idx = np.nonzero(particles.valid)[0]
    ev = particles.event[idx]
    order = idx[np.argsort(ev, kind="stable")]
    offsets = np.searchsorted(particles.event[order], np.arange(n_events + 1))
    return order, offsets


def _auto_precision(cols, requested: int | None, default: int) -> int:
    """%.Ne digits: the requested count, or ``default`` unless every column
    is float32-valued, where %.9e (10 significant digits) already
    round-trips the f32 payload exactly -- half the bytes formatted."""
    if requested is not None:
        return requested
    if all(np.asarray(c).dtype == np.float32 for c in cols):
        return min(9, default)
    return default


def _write_event_files(pattern: str, header: str, sep: str, precision: int,
                       include_counter: bool, offsets: np.ndarray,
                       mcid: np.ndarray, cols: list[np.ndarray],
                       event_base: int = 0) -> int:
    """Write events [event_base, event_base + len(offsets) - 1) to per-event
    files (native threaded writer, Python fallback).  Rows pre-sorted by
    event.  Returns rows written."""
    n_events = len(offsets) - 1
    cols = [np.asarray(c, np.float64) for c in cols]
    from .fastio import write_events_fast
    if write_events_fast(pattern, header, sep, precision, include_counter,
                         offsets, mcid, cols, event_base=event_base):
        return int(offsets[-1] - offsets[0])
    for ievent in range(n_events):  # pure-Python fallback
        rows = slice(offsets[ievent], offsets[ievent + 1])
        with open(pattern.replace("%lld", str(event_base + ievent + 1)),
                  "w") as fh:
            fh.write(header + "\n")
            for n, vals in enumerate(zip(mcid[rows],
                                         *[c[rows] for c in cols])):
                lead = f"{n}{sep}" if include_counter else ""
                fh.write(lead + str(vals[0]) + sep
                         + sep.join(f"{v:.{precision}e}" for v in vals[1:])
                         + "\n")
    return int(offsets[-1] - offsets[0])


_OSCAR_HEADER = "n pid px py pz E m x y z t"
_OSCAR_COLS = ("px", "py", "pz", "E", "mass", "x", "y", "z", "t")
_CSV_HEADER = "mcid,tau,x,y,eta,E,px,py,pz"
_CSV_COLS = ("tau", "x", "y", "eta", "E", "px", "py", "pz")


def write_particle_list_oscar(results_dir: Path, particles, n_events: int,
                              precision: int | None = None):
    """OSCAR particle lists for UrQMD/SMASH afterburners
    (write_particle_list_OSC, EmissionFunction.cpp:645-678).

    Uses the threaded native row formatter (csrc/is3d2_io.cpp); a 1e7-hadron
    oversampling export is ~100x slower through Python f-strings.  Matches
    the reference's setprecision(16) for f64 data; f32 sampler output is
    written at %.9e (exact f32 round-trip, see _auto_precision)."""
    order, offsets = _sort_by_event(particles, n_events)
    _ensure(results_dir / "x")  # create parent dirs
    raw = [getattr(particles, c) for c in _OSCAR_COLS]
    precision = _auto_precision(raw, precision, 16)
    cols = [np.asarray(c)[order] for c in raw]
    _write_event_files(str(results_dir / "particle_list_osc_%lld.dat"),
                       _OSCAR_HEADER, " ", precision, True, offsets,
                       particles.mcid[order], cols)


def write_particle_list_csv(results_dir: Path, particles, n_events: int):
    """Plain CSV particle lists (write_particle_list_toFile,
    EmissionFunction.cpp:611-642)."""
    order, offsets = _sort_by_event(particles, n_events)
    _ensure(results_dir / "x")
    cols = [np.asarray(getattr(particles, c))[order] for c in _CSV_COLS]
    _write_event_files(str(results_dir / "particle_list_%lld.dat"),
                       _CSV_HEADER, ",", 8, False, offsets,
                       particles.mcid[order], cols)


class StreamingEventWriter:
    """``chunk_consumer`` that EXPORTS each sampler chunk's event files as
    the chunk arrives.  Chunks own disjoint event-id ranges
    [ev0, ev0 + n_ev), so every particle-list file is completed by exactly
    one chunk; the per-chunk sort + native format/write runs on the host
    while the device computes the chunks still queued (sampler
    iter_chunks dispatches a window ahead).  On the 1-core production host
    this hides the otherwise-serial post-hoc export (measured 44 s at 1e7
    hadrons, NORTHSTAR r2) behind sampler compute; only the last chunk's
    export is exposed.

    Also retains the kept host rows (a ChunkCollector), so
    ``particle_list()`` still returns the in-memory campaign ParticleList
    for the JETSCAPE-style library path."""

    def __init__(self, results_dir: Path, oscar: bool = True,
                 csv: bool = False, precision: int | None = None):
        from ..core.sampler import ChunkCollector
        self._collector = ChunkCollector()
        self.results_dir = Path(results_dir)
        self.oscar = oscar
        self.csv = csv
        self.precision = precision
        self.transfer_seconds = 0.0   # blocking device->host gets
        self.write_seconds = 0.0      # host sort + format + file writes
        self.rows_written = 0
        self.events_written = 0
        _ensure(self.results_dir / "x")

    def __call__(self, ch: dict) -> None:
        import time
        t0 = time.perf_counter()
        self._collector(ch)
        t1 = time.perf_counter()
        part = self._collector._parts[-1]
        ev0, n_ev = int(ch["ev0"]), int(ch["n_ev"])

        order = np.argsort(part["event"], kind="stable")
        ev_sorted = part["event"][order]
        offsets = np.searchsorted(ev_sorted, np.arange(ev0, ev0 + n_ev + 1))
        mcid = self._collector._mcid_table[part["sp_idx"][order]]
        if self.oscar:
            raw = [part[c] for c in _OSCAR_COLS]
            prec = _auto_precision(raw, self.precision, 16)
            self.rows_written += _write_event_files(
                str(self.results_dir / "particle_list_osc_%lld.dat"),
                _OSCAR_HEADER, " ", prec, True, offsets, mcid,
                [r[order] for r in raw], event_base=ev0)
        if self.csv:
            self.rows_written += _write_event_files(
                str(self.results_dir / "particle_list_%lld.dat"),
                _CSV_HEADER, ",", 8, False, offsets, mcid,
                [part[c][order] for c in _CSV_COLS], event_base=ev0)
        self.events_written += n_ev
        self.transfer_seconds += t1 - t0
        self.write_seconds += time.perf_counter() - t1

    def particle_list(self):
        return self._collector.particle_list()
