"""Continuous-batching decode scheduler.

The TPU-native replacement for the reference's whisper_state pool
(/root/reference/src/stt_engine.cpp:36-85; SURVEY.md §2.2 item 2 and §7
hard-part #1): instead of N independent decode contexts, concurrent
requests share ONE jitted decode step over a fixed slot array. New windows
are admitted into free slots mid-flight — all admissions of a tick share
one encoder launch and one batched prefill — every step advances all live
slots at their own positions, and finished slots are harvested and
recycled without recompiling anything.

Device-resident state (static shapes, S = max_slots, F = xa_ctx):
  tokens   [S, ctx]      sampled-token buffers
  pos      [S]           per-slot decode position
  done     [S]           finished flags
  kv       [L, S, H/2, cache_len, 2*hd]  self cache (position-major,
           head-paired rows [x_h0|x_h1] — models/whisper.init_kv_cache)
  xa_kv    [L, S, H, hd, F]           cross-attention K/V per slot
                                      (int8 + [L,S,H,F] scales when
                                      kv_bits; an int4 packed carrier is
                                      unpacked into the int8 container at
                                      insert — same numerics, jit-boundary
                                      safe, see ops/quant.py)
  sample_begin [S]       per-slot prompt length
  tok_lps  [S, ctx]      per-token logprobs

Host side: a worker thread drains a request queue, fills slots, runs step
chunks (``steps_per_sync`` decode steps per host round-trip), and resolves
futures. Every admitted request's future is installed BEFORE any device
work, so an admission failure rejects (never orphans) it. Greedy decoding;
the temperature-fallback ladder and beam search stay on the offline path
(engine._decode_one).
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
    # True when the slot's EOT was FORCED by hitting max_len (the one-shot
    # decode_window loop would simply have stopped there: no EOT token is
    # sampled, so neither its logprob nor a +1 in the avg denominator).
    forced_eot: jnp.ndarray  # [S] bool
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
    xa_kv: Optional[dict]  # precomputed [L,1,H,hd,F] K/V, or None
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
        kv_bits: Optional[int] = None,
        xa_ctx: Optional[int] = None,
        self_dtype=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.params = params
        self.ids = ids
        self.suppress_mask = suppress_mask
        self.S = max_slots
        self.cache_len = cache_len
        self.steps_per_sync = steps_per_sync
        # Multi-chip mesh (engine MESH_SHAPE): the worker thread enters it
        # so all batcher ops trace/execute with the same ambient mesh as
        # the engine (pairing_ok and sharding constraints are
        # mesh-sensitive — a mismatch would mix cache layouts).
        self.mesh = mesh
        # Quantized cross-attention K/V slabs (compute_type=int8/int4):
        # halves the dominant HBM read of every decode step (ops/quant.py).
        # kv_bits=4 requests arrive as packed carriers and are unpacked
        # into the int8 container ([-7,7] values + int4 scales) at insert —
        # identical numerics to the one-shot int4 path.
        if kv_bits is None:
            kv_bits = 8 if quantize_kv else 0
        self.kv_bits = kv_bits
        self.quantize_kv = kv_bits > 0
        # Self-KV ring-slab storage dtype (engine self_cache policy;
        # float8_e4m3fn halves the per-step self read — init_kv_cache).
        self.self_dtype = self_dtype
        # Cross-attention context width (audio_ctx bucket). Engine keeps
        # one batcher pool per bucket so cropped windows batch too.
        self.xa_ctx = xa_ctx or cfg.n_audio_ctx
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._slot_req: list[Optional[_Request]] = [None] * max_slots
        with self._mesh_ctx():
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
            cfg.n_text_layer, S, cfg.n_text_head, hd, self.xa_ctx,
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
            forced_eot=jnp.zeros((S,), bool),
            sample_begin=jnp.zeros((S,), jnp.int32),
            max_len=jnp.zeros((S,), jnp.int32),
            sum_lp=jnp.zeros((S,), jnp.float32),
            tok_lps=jnp.zeros((S, cfg.n_text_ctx), jnp.float32),
            no_speech=jnp.zeros((S,), jnp.float32),
            kv=init_kv_cache(
                cfg, S, self.cache_len, paired=pairing_ok(cfg),
                dtype=self.self_dtype,
            ),
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

    def is_idle(self) -> bool:
        """True when no slot is occupied and nothing is queued — a new
        request would decode alone (the engine's cue to prefer the
        speculative path over batcher admission when a draft model is
        configured). Advisory: racy by nature, never load-bearing."""
        return self._queue.empty() and all(
            r is None for r in self._slot_req
        )

    def shutdown(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=10)

    # ------------------------------------------------------------------
    # Jitted device ops
    # ------------------------------------------------------------------
    def _encode(self, audio) -> dict:
        """[N, samples] audio → per-slot cross K/V, one fused executable
        (mel + encoder + precompute + optional int8 quantize). The whole
        tick's raw-audio admissions ride ONE launch."""
        bits = 8 if self.quantize_kv else 0
        return _encode_op(self.cfg, self.params, jnp.asarray(audio), bits)

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

    def _mesh_ctx(self):
        import contextlib

        if self.mesh is None:
            return contextlib.nullcontext()
        return jax.set_mesh(self.mesh)

    def _worker(self):
        if self.mesh is not None:
            jax.set_mesh(self.mesh)  # thread-local; worker-thread lifetime
        while not self._stop.is_set():
            try:
                self._worker_tick()
            except Exception as e:  # noqa: BLE001 — fail open, not silent
                for i, req in enumerate(self._slot_req):
                    if req is not None and not req.future.done():
                        req.future.set_exception(e)
                    self._slot_req[i] = None
                self._state = self._init_state()

    def _admit(self, admits: list[tuple[int, _Request]]):
        """Install a tick's admissions: one encoder launch for every
        raw-audio window, one batched prefill + install per prompt-length
        bucket. Raises on failure with ``self._state`` unchanged (the
        insert op is functional)."""
        from ..models.sampling import prompt_bucket

        groups: dict[int, list[tuple[int, _Request]]] = {}
        for slot, req in admits:
            groups.setdefault(prompt_bucket(len(req.init_tokens)), []).append(
                (slot, req)
            )
        n_crop = self.xa_ctx * 320  # encoder positions → samples
        for bucket, group in groups.items():
            # Raw-audio requests first so their rows align with the single
            # batched encode; pre-encoded requests follow as-is.
            raws = [(s, r) for s, r in group if r.xa_kv is None]
            encs = [(s, r) for s, r in group if r.xa_kv is not None]
            parts = []
            if raws:
                audio = np.zeros((len(raws), n_crop), np.float32)
                for j, (_, r) in enumerate(raws):
                    w = np.asarray(r.audio, np.float32).reshape(-1)[:n_crop]
                    audio[j, : w.shape[0]] = w
                enc = self._encode(audio)
                parts.append(enc)
                # Stash each raw request's cross-KV slice so the harvest
                # can return it — the engine reuses it for the DTW
                # timestamp pass and any fallback-ladder re-decode
                # instead of encoding the window a second time.
                for j, (_, r) in enumerate(raws):
                    r.xa_kv = {k: v[:, j : j + 1] for k, v in enc.items()}
            parts.extend(r.xa_kv for _, r in encs)
            ordered = raws + encs
            N = len(ordered)
            prompts = np.full((N, bucket), self.ids.eot, np.int32)
            n_prompts = np.zeros((N,), np.int32)
            sots = np.zeros((N,), np.int32)
            max_lens = np.zeros((N,), np.int32)
            slots = np.zeros((N,), np.int32)
            for j, (slot, req) in enumerate(ordered):
                n = len(req.init_tokens)
                prompts[j, :n] = req.init_tokens
                n_prompts[j] = n
                sots[j] = req.sot_index
                max_lens[j] = min(
                    n + req.max_tokens,
                    self.cache_len - 1,  # KV slab bound
                    self.cfg.n_text_ctx - 1,
                )
                slots[j] = slot
            self._state = _insert_slots_op(
                self.cfg, self.ids, self.cache_len, bucket, self.kv_bits,
                self.params, self._state, tuple(parts),
                jnp.asarray(slots), jnp.asarray(prompts),
                jnp.asarray(n_prompts), jnp.asarray(sots),
                jnp.asarray(max_lens),
            )

    def _worker_tick(self):
        # Admit new requests into free slots. Futures are installed in
        # _slot_req BEFORE any device work: if admission fails, _admit's
        # except (or the _worker backstop) rejects them — nothing orphans.
        admits: list[tuple[int, _Request]] = []
        for slot in self._free_slots():
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            self._slot_req[slot] = req
            admits.append((slot, req))
        if admits:
            try:
                self._admit(admits)
            except Exception as e:  # noqa: BLE001 — reject, don't orphan
                for slot, req in admits:
                    self._slot_req[slot] = None
                    if not req.future.done():
                        req.future.set_exception(e)

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
            lps = tok_lps[sb : sb + len(seq)]
            sum_lp = float(np.asarray(self._state.sum_lp[slot]))
            # Denominator matches decode_window (sampling.py:468-474): a
            # sampled EOT counts (+1); a max_len-forced EOT does not (the
            # one-shot loop would just have stopped — no EOT was sampled).
            forced = bool(np.asarray(self._state.forced_eot[slot]))
            n_sampled = max(len(seq) + (0 if forced else 1), 1)
            req.future.set_result(
                {
                    "tokens": seq,
                    "token_logprobs": lps,
                    "sum_logprob": sum_lp,
                    "avg_logprob": sum_lp / n_sampled,
                    "no_speech_prob": float(
                        np.asarray(self._state.no_speech[slot])
                    ),
                    # Cross-KV of this window ([L,1,...] leaves; for raw-
                    # audio submissions, a slice of the tick's batched
                    # encode) — callers reuse it downstream.
                    "xa_kv": req.xa_kv,
                }
            )


@functools.partial(jax.jit, static_argnames=("cfg", "bits"))
def _encode_op(cfg, params, audio, bits):
    mel = compute_log_mel(audio, n_mels=cfg.n_mels, dtype=cfg.dtype)
    return precompute_xa_kv(cfg, params, encoder_apply(cfg, params, mel), bits)


def _to_state_xa(xa_kv: dict, kv_bits: int) -> dict:
    """Convert an incoming cross-KV dict to the batcher state's container
    format (bf16, or int8 values + f32 scales). A packed int4 carrier
    ("k_p", ops/quant.py) is unpacked into int8 ([-7,7] values keep the
    int4 scales — numerics identical to the native-int4 one-shot path);
    a bf16 dict entering a quantized pool is int8-quantized here."""
    if kv_bits == 0:
        if "k" not in xa_kv:
            raise ValueError("bf16 batcher pool fed a quantized KV dict")
        return xa_kv
    if "k_p" in xa_kv:
        from ..ops.quant import unpack_nibbles_i8

        return {
            "k_q": unpack_nibbles_i8(xa_kv["k_p"]),
            "k_scale": xa_kv["k_scale"],
            "v_q": unpack_nibbles_i8(xa_kv["v_p"]),
            "v_scale": xa_kv["v_scale"],
        }
    if "k_q" in xa_kv:
        return xa_kv
    from ..ops.quant import quantize_weight

    k_q, k_scale = quantize_weight(xa_kv["k"], axis=-2)
    v_q, v_scale = quantize_weight(xa_kv["v"], axis=-2)
    return {"k_q": k_q, "k_scale": k_scale, "v_q": v_q, "v_scale": v_scale}


@functools.partial(
    jax.jit, static_argnames=("cfg", "ids", "cache_len", "prompt_len", "kv_bits")
)
def _insert_slots_op(
    cfg, ids, cache_len, prompt_len, kv_bits, params, state, xa_parts,
    slots, prompts, n_prompts, sot_indices, max_lens,
):
    """Prefill N windows' prompts in ONE decoder pass and install them at
    ``slots``. ``xa_parts`` is a tuple of cross-KV dicts whose batch dims
    sum to N (one batched encode result + any pre-encoded singles), each
    converted to the state container format and concatenated.

    The prompt buffer length is a static bucket; the real lengths
    ``n_prompts`` trace, so prompt-carry-over windows of every length
    share a handful of compiled prefills."""
    parts = [_to_state_xa(p, kv_bits) for p in xa_parts]
    if len(parts) == 1:
        xa_new = parts[0]
    else:
        xa_new = {
            k: jnp.concatenate([p[k] for p in parts], axis=1)
            for k in parts[0]
        }
    N = prompts.shape[0]

    kvN = init_kv_cache(
        cfg, N, cache_len, paired=pairing_ok(cfg),
        dtype=state.kv["k"].dtype,  # match the ring slab (f8 policy)
    )
    logits, kvN, _ = decoder_apply(
        cfg, params, prompts, jnp.int32(0), kvN, xa_new
    )
    # no_speech prob at each row's sot position.
    sot_logits = jnp.take_along_axis(
        logits, sot_indices[:, None, None], axis=1
    )[:, 0]
    nsp = jax.nn.softmax(sot_logits, axis=-1)[:, ids.no_speech]
    last = jnp.take_along_axis(
        logits, (n_prompts - 1)[:, None, None], axis=1
    )[:, 0]

    # Ring placement: prompt token j must live at row
    # (ring_row - n_prompt + 1 + j) mod C of the slot's lane; the prefill
    # wrote it at row j, so roll the position axis into place per row.
    # (Bucketed-prefill garbage rows land at "future" ring ages — they are
    # masked until overwritten by real appends.)
    shifts = jnp.mod(state.ring_row - n_prompts + 1, cache_len)  # [N]
    kv_rolled = {
        k: jax.vmap(
            lambda x, s: jnp.roll(x, s, axis=2), in_axes=(1, 0), out_axes=1
        )(kvN[k], shifts)
        for k in ("k", "v")
    }

    # Token rows: prompt padded with EOT to the full context.
    rows = jnp.concatenate(
        [
            prompts,
            jnp.full((N, cfg.n_text_ctx - prompt_len), ids.eot, jnp.int32),
        ],
        axis=1,
    )

    kv = dict(state.kv)
    xa_kv = dict(state.xa_kv)
    tokens = state.tokens
    tok_lps = state.tok_lps
    last_logits = state.last_logits
    zero_lps = jnp.zeros((1, cfg.n_text_ctx))
    for i in range(N):  # static N: one fused executable, N sublane DUS's
        s = slots[i]

        def put(dst, src):  # install [1,...] src at slot s (axis 0)
            return jax.lax.dynamic_update_slice_in_dim(
                dst, src.astype(dst.dtype), s, axis=0
            )

        tokens = put(tokens, rows[i : i + 1])
        tok_lps = put(tok_lps, zero_lps)
        last_logits = put(last_logits, last[i : i + 1])
        for k in kv:
            kv[k] = jax.lax.dynamic_update_slice_in_dim(
                kv[k], kv_rolled[k][:, i : i + 1], s, axis=1
            )
        for k in xa_kv:
            xa_kv[k] = jax.lax.dynamic_update_slice_in_dim(
                xa_kv[k], xa_new[k][:, i : i + 1].astype(xa_kv[k].dtype),
                s, axis=1,
            )

    return BatchState(
        tokens=tokens,
        pos=state.pos.at[slots].set(n_prompts),
        done=state.done.at[slots].set(False),
        forced_eot=state.forced_eot.at[slots].set(False),
        sample_begin=state.sample_begin.at[slots].set(n_prompts),
        max_len=state.max_len.at[slots].set(max_lens),
        sum_lp=state.sum_lp.at[slots].set(0.0),
        tok_lps=tok_lps,
        no_speech=state.no_speech.at[slots].set(nsp),
        kv=kv,
        xa_kv=xa_kv,
        last_logits=last_logits,
        ring_row=state.ring_row,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "ids", "n_steps"))
def _step_chunk_op(cfg, ids, n_steps, params, suppress_mask, state):
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
        forced = hit_max & ~state.done
        next_tok = jnp.where(state.done | hit_max, ids.eot, next_tok)
        # A forced EOT was never sampled: its logprob (still the pre-
        # override argmax token's) must not enter sum_lp, exactly like the
        # one-shot loop that simply stops at max_len (sampling.py:446-448).
        tok_lp = jnp.where(state.done | forced, 0.0, tok_lp)

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
            forced_eot=state.forced_eot | forced,
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
