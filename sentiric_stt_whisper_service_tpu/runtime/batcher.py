"""Continuous-batching decode scheduler.

The TPU-native replacement for the reference's whisper_state pool
(/root/reference/src/stt_engine.cpp:36-85; SURVEY.md §2.2 item 2 and §7
hard-part #1): instead of N independent decode contexts, concurrent
requests share ONE jitted decode step over a fixed slot array. New windows
are admitted into free slots mid-flight (encoder + prefill batched), every
step advances all live slots at their own positions, and finished slots
are harvested and recycled without recompiling anything.

Device-resident state (static shapes, S = max_slots):
  tokens   [S, ctx]      sampled-token buffers
  pos      [S]           per-slot decode position
  done     [S]           finished flags
  kv       [L, S, H/2, cache_len, 2*hd]  self cache (position-major,
           head-paired rows [x_h0|x_h1] — models/whisper.init_kv_cache)
  xa_kv    [L, S, H, hd, 1500]        cross-attention K/V per slot
                                      (int8 + [L,S,H,1500] scales when
                                      quantize_kv)
  sample_begin [S]       per-slot prompt length
  tok_lps  [S, ctx]      per-token logprobs

Host side: a worker thread drains a request queue, fills slots, runs step
chunks (``steps_per_sync`` decode steps per host round-trip), and resolves
futures. Greedy decoding; the temperature-fallback ladder and beam search
stay on the offline path (engine._decode_one).
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
from concurrent.futures import Future
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sampling import NEG_INF, TokenIds, apply_timestamp_rules
from ..models.whisper import (
    WhisperConfig,
    decoder_apply,
    decoder_step,
    encoder_apply,
    init_kv_cache,
    pairing_ok,
    precompute_xa_kv,
)
from ..ops import compute_log_mel


class BatchState(NamedTuple):
    tokens: jnp.ndarray  # [S, ctx] int32
    pos: jnp.ndarray  # [S] int32
    done: jnp.ndarray  # [S] bool
    sample_begin: jnp.ndarray  # [S] int32
    max_len: jnp.ndarray  # [S] int32
    sum_lp: jnp.ndarray  # [S] fp32
    tok_lps: jnp.ndarray  # [S, ctx] fp32
    no_speech: jnp.ndarray  # [S] fp32
    kv: dict
    xa_kv: dict
    last_logits: jnp.ndarray  # [S, V] fp32
    # Global ring write row: every step appends ALL slots' K/V at this row
    # of their lanes (one shared sublane DUS instead of a per-slot scatter;
    # docs/PERF.md). A slot's tokens occupy the circular arc of pos+1 rows
    # ending here.
    ring_row: jnp.ndarray  # scalar int32


@dataclasses.dataclass
class _Request:
    audio: Optional[np.ndarray]  # [N_SAMPLES] float32 window, or None
    xa_kv: Optional[dict]  # precomputed [L,1,H,1500,hd] K/V, or None
    init_tokens: list[int]
    sot_index: int
    max_tokens: int
    future: Future
    # Cooperative cancellation, polled once per step chunk (the
    # reference's abort callback into the decode loop,
    # stt_engine.cpp:215-219).
    should_abort: Optional[callable] = None


class ContinuousBatcher:
    def __init__(
        self,
        cfg: WhisperConfig,
        params,
        ids: TokenIds,
        suppress_mask: jnp.ndarray,
        max_slots: int = 8,
        cache_len: int = 256,
        steps_per_sync: int = 4,
        quantize_kv: bool = False,
    ):
        self.cfg = cfg
        self.params = params
        self.ids = ids
        self.suppress_mask = suppress_mask
        self.S = max_slots
        self.cache_len = cache_len
        self.steps_per_sync = steps_per_sync
        # int8 cross-attention K/V slabs (compute_type=int8): halves the
        # dominant HBM read of every decode step (ops/quant.py).
        self.quantize_kv = quantize_kv
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._slot_req: list[Optional[_Request]] = [None] * max_slots
        self._state = self._init_state()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, daemon=True, name="continuous-batcher"
        )
        self._thread.start()

    # ------------------------------------------------------------------
    def _init_state(self) -> BatchState:
        cfg, S = self.cfg, self.S
        hd = cfg.n_text_state // cfg.n_text_head
        # KF layout: [L, S, H, hd, F] slabs; int8 scales drop the hd axis.
        xa_shape = (
            cfg.n_text_layer, S, cfg.n_text_head, hd, cfg.n_audio_ctx,
        )
        scale_shape = xa_shape[:3] + xa_shape[4:]
        if self.quantize_kv:
            xa_zero = {
                "k_q": jnp.zeros(xa_shape, jnp.int8),
                "k_scale": jnp.zeros(scale_shape, jnp.float32),
                "v_q": jnp.zeros(xa_shape, jnp.int8),
                "v_scale": jnp.zeros(scale_shape, jnp.float32),
            }
        else:
            xa_zero = {
                "k": jnp.zeros(xa_shape, cfg.dtype),
                "v": jnp.zeros(xa_shape, cfg.dtype),
            }
        return BatchState(
            tokens=jnp.full((S, cfg.n_text_ctx), self.ids.eot, jnp.int32),
            pos=jnp.zeros((S,), jnp.int32),
            done=jnp.ones((S,), bool),  # empty slots count as done
            sample_begin=jnp.zeros((S,), jnp.int32),
            max_len=jnp.zeros((S,), jnp.int32),
            sum_lp=jnp.zeros((S,), jnp.float32),
            tok_lps=jnp.zeros((S, cfg.n_text_ctx), jnp.float32),
            no_speech=jnp.zeros((S,), jnp.float32),
            kv=init_kv_cache(cfg, S, self.cache_len, paired=pairing_ok(cfg)),
            xa_kv=xa_zero,
            last_logits=jnp.zeros((S, cfg.n_vocab), jnp.float32),
            ring_row=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------
    def submit(
        self,
        window_audio: np.ndarray,
        init_tokens: list[int],
        sot_index: int,
        max_tokens: int = 224,
        should_abort=None,
    ) -> Future:
        """Queue one 30 s window for decoding; resolves to a dict with
        tokens / token_logprobs / sum_logprob / avg_logprob / no_speech
        (or None if aborted)."""
        fut: Future = Future()
        self._queue.put(
            _Request(
                window_audio, None, list(init_tokens), sot_index, max_tokens,
                fut, should_abort,
            )
        )
        self._wake.set()
        return fut

    def submit_encoded(
        self,
        xa_kv: dict,
        init_tokens: list[int],
        sot_index: int,
        max_tokens: int = 224,
        should_abort=None,
    ) -> Future:
        """Like :meth:`submit` but with the encoder pass already done
        (the engine reuses its per-window xa_kv)."""
        fut: Future = Future()
        self._queue.put(
            _Request(
                None, xa_kv, list(init_tokens), sot_index, max_tokens, fut,
                should_abort,
            )
        )
        self._wake.set()
        return fut

    def shutdown(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=10)

    # ------------------------------------------------------------------
    # Jitted device ops
    # ------------------------------------------------------------------
    def _encode(self, audio) -> dict:
        """[1, N_SAMPLES] audio → per-slot cross K/V, one fused executable
        (mel + encoder + precompute + optional int8 quantize)."""
        if self.quantize_kv:
            return _encode_q_op(self.cfg, self.params, jnp.asarray(audio))
        return _encode_op(self.cfg, self.params, jnp.asarray(audio))
    def _insert_slot(
        self,
        state: BatchState,
        slot: jnp.ndarray,  # scalar int32
        xa_kv1: dict,  # [L, 1, H, 1500, hd]
        prompt: jnp.ndarray,  # [1, prompt_len] int32, EOT-padded to a bucket
        n_prompt: int,
        sot_index: jnp.ndarray,  # scalar
        max_len: jnp.ndarray,  # scalar
    ) -> BatchState:
        """Prefill one window's prompt and install it into ``slot``.

        The prompt buffer length is a static bucket; the real length
        ``n_prompt`` traces, so prompt-carry-over windows of every length
        share a handful of compiled prefills."""
        return _insert_slot_op(
            self.cfg, self.ids, self.cache_len, int(prompt.shape[1]),
            self.params, state, slot, xa_kv1, prompt,
            jnp.int32(n_prompt), sot_index, max_len,
        )


    def _step_chunk(self, state: BatchState, n_steps: int) -> BatchState:
        """Advance all live slots ``n_steps`` greedy decode steps."""
        return _step_chunk_op(
            self.cfg, self.ids, n_steps, self.params, self.suppress_mask, state
        )

    # ------------------------------------------------------------------
    # Worker loop (host)
    # ------------------------------------------------------------------
    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _worker(self):
        while not self._stop.is_set():
            try:
                self._worker_tick()
            except Exception as e:  # noqa: BLE001 — fail open, not silent
                for i, req in enumerate(self._slot_req):
                    if req is not None and not req.future.done():
                        req.future.set_exception(e)
                    self._slot_req[i] = None
                self._state = self._init_state()

    def _worker_tick(self):
        cfg = self.cfg
        if True:
            # Admit new requests into free slots.
            for slot in self._free_slots():
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req.xa_kv is not None:
                    xa_kv1 = req.xa_kv
                else:
                    xa_kv1 = self._encode(req.audio[None])
                from ..models.sampling import prompt_bucket

                n_prompt = len(req.init_tokens)
                bucket = prompt_bucket(n_prompt)
                padded = np.full((1, bucket), self.ids.eot, np.int32)
                padded[0, :n_prompt] = req.init_tokens
                self._state = self._insert_slot(
                    self._state,
                    jnp.int32(slot),
                    xa_kv1,
                    jnp.asarray(padded),
                    n_prompt,
                    jnp.int32(req.sot_index),
                    jnp.int32(
                        min(
                            len(req.init_tokens) + req.max_tokens,
                            self.cache_len - 1,  # KV slab bound
                            cfg.n_text_ctx - 1,
                        )
                    ),
                )
                self._slot_req[slot] = req

            # Cooperative abort: cancelled slots resolve immediately.
            for slot, req in enumerate(self._slot_req):
                if req is not None and req.should_abort and req.should_abort():
                    self._slot_req[slot] = None
                    self._state = self._state._replace(
                        done=self._state.done.at[slot].set(True)
                    )
                    if not req.future.done():
                        req.future.set_result(None)

            live = [i for i, r in enumerate(self._slot_req) if r is not None]
            if not live:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                return

            self._state = self._step_chunk(self._state, self.steps_per_sync)
            done = np.asarray(self._state.done)
            pos = np.asarray(self._state.pos)

            for slot in live:
                if not done[slot]:
                    continue
                req = self._slot_req[slot]
                self._slot_req[slot] = None
                tokens = np.asarray(self._state.tokens[slot])
                tok_lps = np.asarray(self._state.tok_lps[slot])
                sb = len(req.init_tokens)
                end = int(pos[slot])
                seq = tokens[sb:end]
                # Trim at first EOT.
                eots = np.nonzero(seq == self.ids.eot)[0]
                if eots.size:
                    seq = seq[: eots[0]]
                n = max(len(seq), 1)
                lps = tok_lps[sb : sb + len(seq)]
                sum_lp = float(np.asarray(self._state.sum_lp[slot]))
                req.future.set_result(
                    {
                        "tokens": seq,
                        "token_logprobs": lps,
                        "sum_logprob": sum_lp,
                        "avg_logprob": sum_lp / (len(seq) + 1),
                        "no_speech_prob": float(
                            np.asarray(self._state.no_speech[slot])
                        ),
                    }
                )


@functools.partial(
    jax.jit, static_argnames=("cfg",)
)
def _encode_op(cfg, params, audio):
    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
    xa = encoder_apply(cfg, params, mel)
    return precompute_xa_kv(cfg, params, xa)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_q_op(cfg, params, audio):
    from ..ops.quant import quantize_xa_kv

    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
    return precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel), bits=8)


@functools.partial(
    jax.jit, static_argnames=("cfg", "ids", "cache_len", "prompt_len")
)
def _insert_slot_op(
    cfg, ids, cache_len, prompt_len, params, state, slot, xa_kv1, prompt,
    n_prompt, sot_index, max_len,
):
    if True:
        kv1 = init_kv_cache(cfg, 1, cache_len, paired=pairing_ok(cfg))
        logits, kv1, _ = decoder_apply(
            cfg, params, prompt, jnp.int32(0), kv1, xa_kv1
        )
        probs_at_sot = jax.nn.softmax(logits[0, sot_index], axis=-1)
        nsp = probs_at_sot[ids.no_speech]

        def put(dst, src):  # install [1,...] src at slot along its S axis
            return jax.lax.dynamic_update_slice_in_dim(
                dst, src.astype(dst.dtype), slot, axis=0
            )

        # prompt is already EOT-padded to prompt_len; pad the rest of the
        # token buffer with EOT too (static shapes, real length = n_prompt).
        row = jnp.concatenate(
            [
                prompt[0],
                jnp.full((cfg.n_text_ctx - prompt_len,), ids.eot, jnp.int32),
            ]
        )[None]
        tokens = put(state.tokens, row)
        # Ring placement: prompt token j must live at row
        # (ring_row - n_prompt + 1 + j) mod C of the slot's lane; the
        # prefill wrote it at row j, so roll the row axis into place.
        # (Bucketed-prefill garbage rows land at "future" ring ages — they
        # are masked until overwritten by real appends.)
        shift = jnp.mod(state.ring_row - n_prompt + 1, cache_len)
        kv = {
            k: jax.lax.dynamic_update_slice_in_dim(
                state.kv[k], jnp.roll(kv1[k], shift, axis=3), slot, axis=1
            )
            for k in ("k", "v")
        }
        xa_kv = {
            k: jax.lax.dynamic_update_slice_in_dim(
                state.xa_kv[k], xa_kv1[k], slot, axis=1
            )
            for k in state.xa_kv
        }
        put1 = lambda dst, val: dst.at[slot].set(val)
        return BatchState(
            tokens=tokens,
            pos=put1(state.pos, n_prompt),
            done=put1(state.done, False),
            sample_begin=put1(state.sample_begin, n_prompt),
            max_len=put1(state.max_len, max_len),
            sum_lp=put1(state.sum_lp, 0.0),
            tok_lps=put(state.tok_lps, jnp.zeros((1, cfg.n_text_ctx))),
            no_speech=put1(state.no_speech, nsp),
            kv=kv,
            xa_kv=xa_kv,
            last_logits=put(
                state.last_logits,
                jax.lax.dynamic_slice_in_dim(logits, n_prompt - 1, 1, axis=1)[:, 0],
            ),
            ring_row=state.ring_row,
        )

@functools.partial(jax.jit, static_argnames=("cfg", "ids", "n_steps"))
def _step_chunk_op(cfg, ids, n_steps, params, suppress_mask, state):
    if True:
        # Position axis of the position-major slab [L, S, H, C, hd] — NOT
        # shape[-1] (= hd): decoder_step's ring ages are mod shape[3], so
        # advancing ring_row mod hd would silently clobber live rows once
        # a decode runs past hd tokens.
        cache_len = state.kv["k"].shape[3]

        def one_step(state: BatchState) -> BatchState:
            logits = state.last_logits + suppress_mask[None, :]
            at_start = state.pos == state.sample_begin
            start_mask = (
                jnp.zeros((cfg.n_vocab,))
                .at[ids.blank].set(NEG_INF)
                .at[ids.eot].set(NEG_INF)
            )
            logits = jnp.where(at_start[:, None], logits + start_mask[None], logits)
            logits = apply_timestamp_rules(
                logits, state.tokens, state.pos, state.sample_begin, ids
            )
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]

            hit_max = state.pos >= jnp.minimum(state.max_len, cfg.n_text_ctx - 1)
            next_tok = jnp.where(state.done | hit_max, ids.eot, next_tok)
            tok_lp = jnp.where(state.done, 0.0, tok_lp)

            write_pos = jnp.minimum(state.pos, cfg.n_text_ctx - 1)
            tokens = jax.vmap(
                lambda row, t, p: row.at[p].set(t)
            )(state.tokens, next_tok, write_pos)
            tok_lps = jax.vmap(
                lambda row, v, p: row.at[p].set(v)
            )(state.tok_lps, tok_lp, write_pos)
            sum_lp = state.sum_lp + tok_lp
            new_done = state.done | (next_tok == ids.eot)

            ring_row = jnp.mod(state.ring_row + 1, cache_len)
            step_logits, kv = decoder_step(
                cfg, params, next_tok,
                jnp.minimum(write_pos, cache_len - 1),
                state.kv, state.xa_kv,
                ring_row=ring_row,
            )
            return BatchState(
                tokens=tokens,
                pos=jnp.where(state.done, state.pos, state.pos + 1),
                done=new_done,
                sample_begin=state.sample_begin,
                max_len=state.max_len,
                sum_lp=sum_lp,
                tok_lps=tok_lps,
                no_speech=state.no_speech,
                kv=kv,
                xa_kv=state.xa_kv,
                last_logits=step_logits,
                ring_row=ring_row,
            )

        for _ in range(n_steps):
            state = one_step(state)
        return state
