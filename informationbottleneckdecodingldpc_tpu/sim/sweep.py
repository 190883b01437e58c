"""SNR sweep controller with per-point persistence and resume.

Reference behavior (BER_simulation_OpenCL.py:58-65,128-136): sweep Eb/N0 from
a start value in 0.1 dB steps (optionally finer once BER drops below a
threshold) until BER <= target or the Eb/N0 cap, saving results after every
point. This controller adds crash-resume: completed points are reloaded from
the results file and the sweep continues after the last one (SURVEY.md §5
"checkpoint / resume").
"""

from __future__ import annotations

import dataclasses
import os

from .engine import BERSimulator, PointCheckpoint, PointResult
from .results import load_partial, load_results, save_results


@dataclasses.dataclass
class SweepSchedule:
    start_db: float = 0.0
    normal_step_db: float = 0.1
    small_step_db: float = 0.1
    small_step_below_ber: float = 1e-6
    max_db: float = 2.0
    target_ber: float = 1e-6
    min_errors: int = 7000
    max_blocks_per_point: int = 10_000_000
    checkpoint_every_steps: int = 50  # persist mid-point counters this often


@dataclasses.dataclass
class SweepController:
    simulator: BERSimulator
    schedule: SweepSchedule
    results_path: str | None = None
    verbose: bool = True
    # Multihost: every process must replay the identical sweep schedule (all
    # collectives are issued inside the jitted step, so a process resuming
    # from different state would desynchronize the psum programs). Process 0
    # reads the results file and broadcasts it as ``resume_state``; non-zero
    # processes resume from that state with ``write_results=False``.
    write_results: bool = True
    resume_state: dict | None = None

    def run(self) -> list[PointResult]:
        sched = self.schedule
        results: list[PointResult] = []
        partial: dict | None = None
        if self.resume_state is not None:
            results = [PointResult(**p) for p in self.resume_state.get("points", [])]
            partial = self.resume_state.get("partial")
            if self.verbose and results:
                print(
                    f"resuming sweep from broadcast state: {len(results)} "
                    f"completed points up to {results[-1].ebn0_db:.2f} dB"
                )
        elif self.results_path and os.path.exists(self.results_path):
            results = load_results(self.results_path)
            partial = load_partial(self.results_path)
            if self.verbose and results:
                print(
                    f"resuming sweep: {len(results)} completed points up to "
                    f"{results[-1].ebn0_db:.2f} dB"
                )
            if self.verbose and partial:
                print(
                    f"resuming mid-point at {partial['ebn0_db']:.2f} dB: "
                    f"{partial['errors']} errors / {partial['blocks']} blocks"
                )

        while True:
            if results:
                last = results[-1]
                if last.ber <= sched.target_ber or last.ebn0_db >= sched.max_db:
                    break
                step = (
                    sched.small_step_db
                    if last.ber < sched.small_step_below_ber
                    else sched.normal_step_db
                )
                ebn0 = round(last.ebn0_db + step, 6)
            else:
                ebn0 = sched.start_db

            checkpoint = None
            if partial is not None and abs(partial["ebn0_db"] - ebn0) < 1e-9:
                checkpoint = PointCheckpoint(**partial)
            partial = None

            def persist_partial(state: PointCheckpoint):
                if (
                    self.write_results
                    and self.results_path
                    and state.step_index % sched.checkpoint_every_steps == 0
                ):
                    save_results(
                        self.results_path, results,
                        partial=dataclasses.asdict(state),
                    )

            point = self.simulator.run_point(
                ebn0,
                min_errors=sched.min_errors,
                max_blocks=sched.max_blocks_per_point,
                verbose=self.verbose,
                checkpoint=checkpoint,
                on_progress=persist_partial,
            )
            results.append(point)
            if self.verbose:
                print(
                    f"EbN0={point.ebn0_db:.2f} dB BER={point.ber:.3e} "
                    f"FER={point.fer:.3e} blocks={point.blocks} "
                    f"coded_bps={point.coded_bits_per_s:.3e}"
                )
            if self.write_results and self.results_path:
                save_results(self.results_path, results)
        return results
