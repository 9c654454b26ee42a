"""Continuous cross-request decode batching.

The reference serializes whole requests behind a mutex
(reference: server/lib/state.rs:13, handlers/speech.rs:26) — one request
owns the model until it finishes. Here, B decode rows share one GenState
and one jitted decode program; a scheduler thread interleaves:

    admit queued requests into free rows (single-row prefill at the
    row's own offset) -> decode a short horizon of frames for ALL rows
    -> hand finished frames to their requests -> repeat.

This is what the engine's per-row positions/masks were built for: rows
are independent, so requests join and leave the batch at chunk
granularity without padding or recompiles. Conditioning-prefix reuse
works per row exactly like the single-stream path (the row's position
counter rewinds to its conditioning length between text chunks).

Sampling parameters are fixed per batcher (they're compiled into the
decode program); per-request seeds are not supported in batched mode
(rows share one RNG stream — same as the reference's fixed-seed static
batch, static_batch.rs:63). Runaway chunks are returned with
hit_max=True instead of rerolled.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import List, Optional

import jax
import numpy as np

from fish_speech_tpu.generate.engine import GenState, LMEngine
from fish_speech_tpu.ops.sampling import SamplingArgs

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _ChunkResult:
    tokens: np.ndarray  # (C, T) codebook rows
    semantic: np.ndarray  # (T,)
    hit_max: bool


class BatchedRequest:
    """Handle returned by ContinuousBatcher.submit: iterate to receive one
    _ChunkResult per text chunk, in order."""

    def __init__(self, prompts: List[np.ndarray], cond_len: int, max_new: int):
        self.prompts = prompts
        self.cond_len = cond_len
        self.max_new = max_new
        self.results: "queue.Queue[Optional[_ChunkResult]]" = queue.Queue()
        self.error: Optional[Exception] = None

    def __iter__(self):
        for _ in range(len(self.prompts)):
            r = self.results.get()
            if r is None:
                raise self.error or RuntimeError("batcher shut down")
            yield r


class _RowState:
    """Scheduler-side tracking for one decode row."""

    def __init__(self, req: BatchedRequest, row: int):
        self.req = req
        self.row = row
        self.chunk_idx = -1  # admitted chunk index
        self.frames: List[np.ndarray] = []  # (C+1,) frames of current chunk
        self.budget = 0
        self.active = False  # row currently decoding a chunk


class ContinuousBatcher:
    def __init__(
        self,
        engine: LMEngine,
        sampling: SamplingArgs,
        *,
        horizon: int = 16,
    ) -> None:
        """engine must be built with batch_size == number of decode rows
        (BASELINE configs target 16 for the 16-concurrent-request serving
        shape)."""
        self.engine = engine
        self.sampling = sampling
        self.horizon = horizon
        self.state: GenState = engine.init_state()
        # idle rows must be device-done, or they decode junk and advance
        # their cache positions between admissions
        self.state = self.state._replace(
            done=self.state.done.at[:].set(True)
        )
        self.rows: List[Optional[_RowState]] = [None] * engine.batch_size
        self.queue: "queue.Queue[BatchedRequest]" = queue.Queue()
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- client side -------------------------------------------------------

    def submit(
        self, prompts: List[np.ndarray], cond_len: int, max_new: int
    ) -> BatchedRequest:
        req = BatchedRequest(prompts, cond_len, max_new)
        self.queue.put(req)
        self._wake.set()
        return req

    def shutdown(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=10)

    # -- scheduler ---------------------------------------------------------

    def _admit(self) -> None:
        """Fill free rows: new requests first, then next chunks of rows
        whose previous chunk just finished (those keep their row)."""
        for r, slot in enumerate(self.rows):
            if slot is not None and not slot.active:
                self._start_chunk(slot)
        for r in range(len(self.rows)):
            if self.rows[r] is None:
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    break
                slot = _RowState(req, r)
                self.rows[r] = slot
                self._start_chunk(slot)

    def _start_chunk(self, slot: _RowState) -> None:
        req = slot.req
        slot.chunk_idx += 1
        prompt = req.prompts[slot.chunk_idx]
        offset = req.cond_len if slot.chunk_idx > 0 else 0
        # prefill_row rewinds the row to `offset` (the per-row
        # clear_slow_caches_until) and marks it live again
        self.state, frame, is_eos = self.engine.prefill_row(
            self.state, prompt, self.sampling, slot.row, offset=offset
        )
        slot.frames = [np.asarray(frame)]
        budget = min(
            req.max_new - 1,
            self.engine.cache_len - (offset + prompt.shape[-1]) - 1,
        )
        slot.budget = max(budget, 0)
        slot.active = True
        if bool(is_eos) or slot.budget == 0:
            self._finish_chunk(slot, hit_max=False)

    def _finish_chunk(self, slot: _RowState, hit_max: bool) -> None:
        stacked = np.stack(slot.frames, axis=1)  # (C+1, T)
        slot.req.results.put(
            _ChunkResult(
                tokens=stacked[1:], semantic=stacked[0], hit_max=hit_max
            )
        )
        slot.active = False
        slot.frames = []
        # silence the row on device until its next admission
        self.state = self.state._replace(
            done=self.state.done.at[slot.row].set(True)
        )
        if slot.chunk_idx + 1 >= len(slot.req.prompts):
            self.rows[slot.row] = None  # request complete; free the row
        # else: row stays reserved; next chunk admitted on the next tick

    def _any_active(self) -> bool:
        return any(s is not None and s.active for s in self.rows)

    def _run(self) -> None:
        im_end = self.engine.token_cfg.im_end_id
        try:
            while not self._stop:
                idle = (
                    all(s is None for s in self.rows) and self.queue.empty()
                )
                if idle:
                    self._wake.wait(timeout=0.1)
                    self._wake.clear()
                    continue
                self._admit()
                if not self._any_active():
                    continue
                self.state, out, valid, steps = self.engine.decode_chunk(
                    self.state, self.sampling, self.horizon
                )
                out, valid, done, steps = jax.device_get(
                    (out, valid, self.state.done, steps)
                )
                steps = int(steps)
                for slot in list(self.rows):
                    if slot is None or not slot.active:
                        continue
                    r = slot.row
                    ended = False
                    for i in range(steps):
                        if valid[i, r]:
                            slot.frames.append(out[i, r])
                            slot.budget -= 1
                            if slot.budget <= 0:
                                self._finish_chunk(slot, hit_max=not done[r])
                                ended = True
                                break
                        else:
                            # first invalid frame of a live row is its EOS
                            self._finish_chunk(slot, hit_max=False)
                            ended = True
                            break
                    if not ended and done[r]:
                        self._finish_chunk(slot, hit_max=False)
        except Exception as e:  # noqa: BLE001 — propagate to waiting clients
            logger.exception("continuous batcher died")
            for slot in self.rows:
                if slot is not None:
                    slot.req.error = e
                    slot.req.results.put(None)
            while not self.queue.empty():
                req = self.queue.get_nowait()
                req.error = e
                req.results.put(None)
