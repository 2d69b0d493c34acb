"""Continuous-batching streaming ASR server.

Production transducer serving multiplexes MANY independent audio streams
onto one accelerator.  A fixed batch (models/streaming.py alone) suffers
head-of-line blocking: the whole batch waits for its longest utterance
before any slot can take new work.  This module adds the standard
continuous-batching loop on top of the stateful streaming decoder:

  * a fixed number of SLOTS (the compiled batch size — shapes never change,
    so one XLA program serves the server's whole lifetime);
  * each step, finished slots are re-armed for queued streams via
    :func:`streaming.streaming_reset` (a fused per-leaf ``where`` — slot
    churn costs no recompilation and no host round-trip);
  * per-stream progress counters (``seen`` warmup masks, ``decoded_t``)
    let slots sit at DIFFERENT positions of different utterances while
    sharing every batched matmul.

Exactness: admission into a used slot is bitwise-identical to decoding in
a fresh batch (the reset restores the exact :func:`streaming_init` leaves;
pinned by tests/test_serving.py against offline greedy/beam decoding).

The reference ships no inference or serving (SURVEY.md §2); this is part
of the framework's serving frontier, alongside the stateful streaming
encoder.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .streaming import StreamingConfig, streaming_init, streaming_reset, streaming_step
from .transducer import PrunedTransducer

__all__ = ["StreamServer"]


@dataclasses.dataclass
class _Slot:
    stream_id: Any
    feats: np.ndarray  # (T, feature_dim) float32
    cursor: int = 0  # input frames already fed

    @property
    def done_feeding(self) -> bool:
        return self.cursor >= len(self.feats)


class StreamServer:
    """Multiplex independent audio streams over ``capacity`` decode slots.

    Usage::

        server = StreamServer(model, params, StreamingConfig(chunk=32),
                              capacity=128)
        server.submit("utt-1", feats_1)     # (T1, feature_dim)
        server.submit("utt-2", feats_2)
        while not server.idle:
            for stream_id, tokens in server.step():
                handle(stream_id, tokens)   # int32 token ids, no blanks

    ``step()`` advances every active slot by one ``chunk`` of input frames
    (one compiled device program: slot reset + stateful encode + greedy or
    beam decode) and returns the streams that finished during that step.
    Feed-as-you-go streams are supported via :meth:`extend`: submit with
    ``final=False`` and append chunks as audio arrives.
    """

    def __init__(
        self,
        model: PrunedTransducer,
        params: Any,
        scfg: StreamingConfig,
        capacity: int,
    ):
        self._model = model
        self._params = params
        self._scfg = scfg
        self._capacity = capacity
        self._F = model.cfg.feature_dim
        self._state = streaming_init(model, scfg, capacity)
        self._slots: List[Optional[_Slot]] = [None] * capacity
        self._open: Dict[Any, _Slot] = {}  # non-final streams by id
        self._pending: collections.deque[_Slot] = collections.deque()

        def _step(params, state, reset, feats, lens):
            state = streaming_reset(model, scfg, state, reset)
            return streaming_step(model, params, scfg, state, feats, lens)

        # donate the carried state so the server holds one buffer set
        self._fn = jax.jit(_step, donate_argnums=(1,))

    # ------------------------------------------------------------- intake
    def submit(self, stream_id: Any, features: np.ndarray, final: bool = True):
        """Queue a stream.  ``features`` is (T, feature_dim); with
        ``final=False`` more audio may be appended via :meth:`extend`
        (the slot then stays live until :meth:`finish` is called)."""
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self._F:
            raise ValueError(
                f"features must be (T, {self._F}), got {feats.shape}"
            )
        if final and len(feats) == 0:
            raise ValueError("a final stream needs at least one frame")
        slot = _Slot(stream_id, feats)
        self._pending.append(slot)
        if not final:
            self._open[stream_id] = slot

    def extend(self, stream_id: Any, features: np.ndarray):
        """Append audio to a non-final stream submitted with final=False."""
        slot = self._open[stream_id]
        feats = np.asarray(features, np.float32)
        slot.feats = np.concatenate([slot.feats, feats], axis=0)

    def finish(self, stream_id: Any):
        """Mark a non-final stream as complete (no more :meth:`extend`)."""
        del self._open[stream_id]

    # ------------------------------------------------------------- status
    @property
    def idle(self) -> bool:
        return not self._pending and all(s is None for s in self._slots)

    @property
    def active_streams(self) -> int:
        return sum(s is not None for s in self._slots) + len(self._pending)

    # --------------------------------------------------------------- step
    def step(self) -> List[Tuple[Any, np.ndarray]]:
        """Advance every slot by one chunk; return finished streams as
        ``(stream_id, tokens)`` with ``tokens`` an int32 array of emitted
        (non-blank) token ids."""
        B, C_in = self._capacity, self._scfg.chunk

        # admit queued streams into free slots
        reset = np.zeros((B,), bool)
        admitted = 0
        for b in range(B):
            if self._slots[b] is None and self._pending:
                self._slots[b] = self._pending.popleft()
                reset[b] = True
                admitted += 1

        # assemble this step's chunk
        feats = np.zeros((B, C_in, self._F), np.float32)
        lens = np.zeros((B,), np.int32)
        for b, slot in enumerate(self._slots):
            if slot is None:
                continue
            n = min(C_in, len(slot.feats) - slot.cursor)
            # a PARTIAL chunk is only exact as a stream's FINAL chunk
            # (streaming_step contract); buffer partials of held-open
            # streams until more audio arrives or finish() is called
            if n < C_in and slot.stream_id in self._open:
                continue
            if n > 0:
                feats[b, :n] = slot.feats[slot.cursor : slot.cursor + n]
                lens[b] = n
                slot.cursor += n

        self._state, (hyps, hyp_lens) = self._fn(
            self._params, self._state,
            jnp.asarray(reset), jnp.asarray(feats), jnp.asarray(lens),
        )

        # a stream is finished once all its input has been fed (every fed
        # frame is decoded in the step that feeds it) and it is not held
        # open for more audio
        finished = []
        done_slots = [
            b
            for b, s in enumerate(self._slots)
            if s is not None and s.done_feeding and s.stream_id not in self._open
        ]
        if done_slots:
            h = np.asarray(hyps)
            hl = np.asarray(hyp_lens)
            for b in done_slots:
                slot = self._slots[b]
                finished.append((slot.stream_id, h[b, : hl[b]].copy()))
                self._slots[b] = None  # freed; re-armed on next admission
        self._progressed = bool(admitted or lens.any() or finished)
        return finished

    def run(self) -> Dict[Any, np.ndarray]:
        """Drive :meth:`step` until idle; return {stream_id: tokens}.

        Raises if the server would spin without progress — i.e. every
        remaining stream is held open (final=False) waiting for
        :meth:`extend`/:meth:`finish` that run() can never deliver."""
        out: Dict[Any, np.ndarray] = {}
        while not self.idle:
            for sid, toks in self.step():
                out[sid] = toks
            if not self._progressed:
                raise RuntimeError(
                    "run() cannot finish: streams submitted with final=False "
                    "are waiting for extend()/finish()"
                )
        return out
