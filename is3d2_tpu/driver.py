"""Top-level particlization driver.

Replaces the reference's IS3D class (iS3D.cpp:81-282) and the
EmissionFunctionArray dispatcher (EmissionFunction.cpp:981-1386): load
parameters, surface, PDG list, delta-f coefficient tables, quadrature grids,
then run the requested operation and write results.

Library use (the JETSCAPE-style in-memory path, iS3D.cpp:33-78) is
``IS3D.load_surface_from_memory(...)``; after operation 2 the sampled events
are available as ``.final_particles``.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import numpy as np

from .config import Config
from .io.tables import GaussLaguerre, GaussLegendre, MomentumGrids, load_table
from .io.pdg import read_pdg, SpeciesTable
from .io.surface import (SurfaceData, ThermoAverages, read_surface,
                         surface_from_memory)
from .io.deltaf_tables import DeltafTables
from .io import output
from .physics.deltaf import DeltafData, compute_particle_densities
from .core.spectra import compute_spectra
from .core.spacetime import compute_dN_dX
from .core.polarization import compute_polarization
from .core.sampler import (ChunkCollector, compute_total_yield,
                           number_of_events, sample_particles)
from .core.sampler_hist import ChunkBinner
from .report import RunReport, check_invariants


class IS3D:
    """One particlization run rooted at a working directory laid out like the
    reference repo (PDG/, tables/, deltaf_coefficients/, input/, results/)."""

    def __init__(self, workdir: str | Path = ".",
                 cfg: Config | None = None,
                 data_dir: str | Path | None = None):
        self.workdir = Path(workdir)
        self.data_dir = Path(data_dir) if data_dir else self.workdir
        if cfg is None:
            cfg = Config.from_file(self.workdir / "iS3D_parameters.dat")
        cfg.validate()
        self.cfg = cfg
        self.surface: SurfaceData | None = None
        self.final_particles = None
        self.spectra = None
        self.histograms = None
        self.report = RunReport()

    # ------------------------------------------------------------------
    def load_surface_from_file(self, path: str | Path | None = None) -> None:
        path = Path(path) if path else self.workdir / "input/surface.dat"
        self.surface = read_surface(path, self.cfg.mode, self.cfg.dimension,
                                    bool(self.cfg.include_baryon))

    def load_surface_from_memory(self, **fields) -> None:
        self.surface = surface_from_memory(**fields)

    # ------------------------------------------------------------------
    def _setup(self):
        cfg = self.cfg
        data = self.data_dir

        self.species = read_pdg(cfg.hrg_eos, data / "PDG")
        chosen_mcids = load_table(data / "PDG/chosen_particles.dat")[:, 0].astype(int)
        self.chosen_mcids = chosen_mcids
        self.chosen_idx = self.species.chosen_indices(
            chosen_mcids, group_by_mass=bool(cfg.group_particles))

        self.laguerre = GaussLaguerre.from_file(data / "tables/gauss/gla_roots_weights.txt")
        self.legendre = GaussLegendre.from_file(data / "tables/gauss/gauss_legendre.dat")
        self.grids = MomentumGrids.from_dir(data / "tables")

        # surface-averaged thermodynamics (cross-phase handoff file,
        # readindata.cpp:363-366)
        self.plasma = self.surface.thermo_averages()
        self.plasma.write(self.workdir
                          / "tables/thermodynamic/average_thermodynamic_quantities.dat")

        tables = DeltafTables.load(cfg.hrg_eos, bool(cfg.include_baryon),
                                   data / "deltaf_coefficients/vh")
        self.df_data = DeltafData(tables, cfg.df_mode, bool(cfg.include_baryon))
        if not cfg.include_baryon:
            self.df_data.compute_jonah_coefficients(self.species, self.laguerre,
                                                    self.plasma)
        compute_particle_densities(self.species, self.df_data, self.laguerre,
                                   self.plasma)

    # ------------------------------------------------------------------
    def run_particlization(self, fo_from_file: bool = True,
                           write: bool = True) -> None:
        cfg = self.cfg
        print(f"is3d2_tpu particlization: operation={cfg.operation} "
              f"df_mode={cfg.df_mode} hrg_eos={cfg.hrg_eos} "
              f"dimension={cfg.dimension}", flush=True)
        t_read = time.time()
        if fo_from_file or self.surface is None:
            self.load_surface_from_file()
        t_read = time.time() - t_read
        print(f"surface: {self.surface.n_cells} cells ({t_read:.1f}s)",
              flush=True)
        t0 = time.time()
        self._setup()
        t_setup = time.time() - t0
        print(f"setup done ({t_setup:.1f}s): "
              f"{len(self.species)} species, {len(self.chosen_idx)} chosen, "
              f"T_avg = {self.plasma.temperature:.4f} GeV", flush=True)
        self.stage_seconds = {"read": t_read, "setup": t_setup}

        results = self.workdir / "results"
        mcids = [int(self.species.mc_id[i]) for i in self.chosen_idx]

        report = self.report
        report.n_cells = self.surface.n_cells
        # tensor-algebra self-checks, always on in the reference
        # (LocalRestFrame.cpp:43-71, 115-131, 164-171)
        report.invariants = check_invariants(
            self.surface, include_baryondiff=bool(cfg.include_baryon
                                                  and cfg.include_baryondiff_deltaf))

        t_compute = time.time()
        if cfg.operation == 0:
            print("computing spacetime distributions dN/dX ...", flush=True)
            dX = compute_dN_dX(self.surface, self.species, self.chosen_idx,
                               self.grids, self.df_data, cfg, self.laguerre,
                               report=report)
            self.dN_dX = dX
            self._mark_compute(t_compute, "dN/dX")
            if write:
                output.write_dN_dX(results, mcids, dX, cfg)

        elif cfg.operation == 1:
            print("computing continuous momentum spectra ...", flush=True)
            spectra = compute_spectra(self.surface, self.species,
                                      self.chosen_idx, self.grids,
                                      self.df_data, cfg, self.laguerre,
                                      report=report)
            self.spectra = spectra
            self._mark_compute(t_compute, "spectra")
            if write:
                tw = time.time()
                output.write_spectra(results, mcids, spectra, self.grids,
                                     cfg.dimension)
                output.write_vn(results, mcids, spectra, self.grids, cfg.dimension)
                output.write_dN_2pipTdpTdy(results, mcids, spectra, self.grids,
                                           cfg.dimension)
                output.write_dN_dphidy(results, mcids, spectra, self.grids,
                                       cfg.dimension)
                output.write_dN_dy(results, mcids, spectra, self.grids,
                                   cfg.dimension)
                self.stage_seconds["write"] = time.time() - tw

        elif cfg.operation == 2:
            Ntot = compute_total_yield(self.surface, self.species,
                                       self.chosen_idx, self.df_data, cfg,
                                       self.laguerre)
            n_events = number_of_events(Ntot, cfg)
            self.n_events = n_events
            print(f"Estimated total particle yield = {int(Ntot)} particles; "
                  f"sampling {n_events} events", flush=True)

            if cfg.test_sampler:
                from .parallel.sharding import auto_mesh
                mesh = auto_mesh(cfg)
                if mesh is not None:
                    # multi-chip: shard the EVENT axis over the mesh (the
                    # reference's process-farm oversampling), psum'd
                    # histograms -- see parallel/sampler_shard.py
                    from .parallel.sampler_shard import (
                        sample_histograms_meshed)
                    from .core.sampler_hist import SampledHistograms
                    hists, _diags = sample_histograms_meshed(
                        self.surface, self.species, self.chosen_idx,
                        self.df_data, cfg, self.laguerre, n_events,
                        mesh, report=report)
                    self._mark_compute(t_compute, "sampling")
                    ta = time.time()
                    self.histograms = SampledHistograms(n_events=n_events,
                                                        **hists)
                else:
                    # stream chunks straight into the device-side binner:
                    # the campaign-wide hadron axis is never concatenated
                    # (a fresh concat shape would force a new compile
                    # every campaign)
                    binner = ChunkBinner(len(mcids), cfg)
                    sample_particles(self.surface, self.species,
                                     self.chosen_idx, self.df_data, cfg,
                                     self.laguerre, n_events,
                                     report=report, chunk_consumer=binner,
                                     mean_kept_1ev=float(Ntot))
                    self._mark_compute(t_compute, "sampling")
                    ta = time.time()
                    self.histograms = binner.result(n_events)
                self.stage_seconds["assemble"] = time.time() - ta
                if write:
                    tw = time.time()
                    output.write_sampled_histograms(results, mcids,
                                                    self.histograms, cfg)
                    self.stage_seconds["write"] = time.time() - tw
                    print(f"histogram output stage took "
                          f"{self.stage_seconds['write']:.3f} seconds",
                          flush=True)
            elif write:
                # stream chunks into the event-file exporter AS they finish:
                # each chunk's device->host transfer, sort and native
                # format/write overlaps the compute of the chunks still
                # queued, so only the final chunk's export is exposed
                # (the post-hoc writer serialized a 44 s export after all
                # compute on the 1-core host, NORTHSTAR r2)
                writer = output.StreamingEventWriter(results,
                                                     csv=bool(cfg.write_csv))
                self._sample_streaming(cfg, n_events, report, writer,
                                       mean_kept_1ev=float(Ntot))
                self._mark_compute(t_compute, "sampling")
                ta = time.time()
                self.final_particles = writer.particle_list()
                self.stage_seconds["assemble"] = time.time() - ta
                self.stage_seconds["write"] = writer.write_seconds
                self.stage_seconds["write_transfer"] = writer.transfer_seconds
                print(f"particle-list export: {writer.rows_written} rows / "
                      f"{writer.events_written} events, "
                      f"{writer.write_seconds:.3f} s host format+write "
                      f"(overlapped with sampling), "
                      f"{writer.transfer_seconds:.3f} s device->host",
                      flush=True)
            else:
                # library path (no files): stream chunks into host numpy
                collector = ChunkCollector()
                self._sample_streaming(cfg, n_events, report, collector,
                                       mean_kept_1ev=float(Ntot))
                self._mark_compute(t_compute, "sampling")
                ta = time.time()
                self.final_particles = collector.particle_list()
                self.stage_seconds["assemble"] = time.time() - ta

        if cfg.mode == 5:
            St, Sx, Sy, Sn, Snorm = compute_polarization(
                self.surface, self.species, self.chosen_idx, self.grids,
                self.plasma, cfg)
            self.polarization = (St, Sx, Sy, Sn, Snorm)
            if write:
                output.write_polarization(results, St, Sx, Sy, Sn, Snorm,
                                          self.grids, cfg.dimension)

        report.print()
        print(f"Particlization took {time.time() - t0:.3f} seconds")

    def _sample_streaming(self, cfg: Config, n_events: int, report,
                          consumer, mean_kept_1ev: float | None = None
                          ) -> None:
        """Production op-2 sampling into a streaming chunk consumer: the
        event axis shards over the mesh when cfg.use_mesh enables one (the
        reference's process-farm oversampling,
        run_multithread_sampling_iS3D.py:18-31), else the single-device
        pipelined chunk stream.  ``mean_kept_1ev`` (= the Ntot yield
        estimate) sizes the kept-row pad analytically so every chunk,
        including the first, runs the fused pipelined program."""
        from .parallel.sharding import auto_mesh
        mesh = auto_mesh(cfg)
        if mesh is not None:
            from .parallel.sampler_shard import sample_particles_meshed
            sample_particles_meshed(self.surface, self.species,
                                    self.chosen_idx, self.df_data, cfg,
                                    self.laguerre, n_events, mesh,
                                    report=report, chunk_consumer=consumer,
                                    lean=True, mean_kept_1ev=mean_kept_1ev)
        else:
            sample_particles(self.surface, self.species, self.chosen_idx,
                             self.df_data, cfg, self.laguerre, n_events,
                             report=report, chunk_consumer=consumer,
                             lean=True, mean_kept_1ev=mean_kept_1ev)

    def _mark_compute(self, t_start: float, what: str) -> None:
        dt = time.time() - t_start
        self.stage_seconds["compute"] = dt
        # the reference prints "Spectra calculation took X seconds"
        # (EmissionFunction.cpp:1375-1385); keep the same shape
        print(f"{what} calculation took {dt:.3f} seconds", flush=True)
