"""Lexicon-constrained beam search as ONE device program.

The host BeamSearcher (decode/beam.py) reproduces the reference's scoring
exactly but launches the decoder once per step, which on launch-latency-
bound deployments dominates the decode time. This variant moves the entire
search — decoder steps, prefix-tree masking/stepping, word-boundary LM
expansion with the device hash-table LM, length penalties, and the
finished-hypothesis buffer — into a single jax.lax.while_loop, so one
launch decodes an utterance.

Scoring semantics follow the host implementation (same reference scheme);
the one structural difference is float32 score arithmetic (the host
accumulates in float64), which can reorder near-tied hypotheses.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from emg_tpu.config import DecodeConfig
from emg_tpu.data.batching import PackedBatch, bucket_up
from emg_tpu.decode.device_lm import DeviceLM
from emg_tpu.decode.prefix_tree import CompiledTree
from emg_tpu.text.phonemes import START_ID

NEG = -jnp.inf

# raw 1 kHz sample-count buckets for search_from_raw (one compile each);
# 1280 samples = 1.28 s, the shortest corpus utterances; steps sized so
# upload pad waste stays under ~35%
RAW_SAMPLE_BUCKETS = [1280, 1920, 2560, 3840, 5120, 7680, 10240, 15360]


class DeviceBeamSearcher:
    # Carry-tuple slot layout, kept in sync with _init_carry/_step_fn.
    # External consumers (continuous.py) must index through these names.
    SLOT_T = 0
    SLOT_ALIVE = 4
    SLOT_FIN_SCORES = 10
    SLOT_FIN_HIST = 11
    SLOT_FIN_WORDS = 12
    SLOT_FIN_WC = 13
    SLOT_CACHES = 14
    SLOT_PSEL = 15  # deferred cache row-reorder selector (applied next step)
    FINISHED_SLOTS = slice(SLOT_FIN_SCORES, SLOT_FIN_WC + 1)

    def __init__(self, model, variables, tree: CompiledTree, device_lm: DeviceLM,
                 cfg: DecodeConfig, max_frames: int, max_steps: int = 64,
                 max_words: int = None, finished_size: int = 64):
        assert cfg.Constrained, "the device beam requires lexicon constraints"
        self.model = model
        if model.cfg.compute_dtype == "bfloat16":
            # hoist the per-use f32->bf16 weight casts out of the step loop
            # (numerics unchanged; see utils/serving.py)
            from emg_tpu.utils.serving import cast_params_for_serving

            variables = cast_params_for_serving(variables)
        if cfg.quantize_int8:
            # int8 storage for the decoder's per-step weight reads
            # (utils/quantize.py; parity gated by tests/test_quantize.py)
            from emg_tpu.utils.quantize import quantize_decoder_int8

            variables = quantize_decoder_int8(variables)
        self.variables = variables
        self.cfg = cfg
        self.max_frames = max_frames
        self.S = max_steps + 1
        # every word consumes at least one phone step, so max_steps words
        # can never be exceeded — a smaller cap would silently freeze
        # hypotheses at word-end nodes where </S> is invalid
        self.MW = max_words if max_words is not None else max_steps
        self.F = finished_size

        # dense tree tables on device; word slots per node fixed to K
        self.K = max((len(w) for w in tree.node_words), default=1)
        n_nodes = tree.child_table.shape[0]
        node_words = np.full((n_nodes, self.K), -1, np.int32)
        for i, ws in enumerate(tree.node_words):
            node_words[i, : len(ws)] = ws
        self.child_table = jnp.asarray(tree.child_table)
        self.mask_table = jnp.asarray(tree.mask_table)
        self.node_words = jnp.asarray(node_words)
        self.root = tree.root
        self.phone_count = tree.phone_count  # 40; end token id == 40
        self.lm = device_lm
        self.tree = tree

        W = cfg.BeamWidth
        self.W = W
        self.H = W * (1 + self.K)
        self._search_fn = None
        self._search_fn_raw = None
        self._vsearch_fn = None

    # ------------------------------------------------------------------
    def _make_ctx(self, variables, batch: PackedBatch, max_len):
        """Per-utterance search context: encoder memory projected into each
        decoder layer's cross K/V, the source pad mask, and the step bound."""
        model = self.model
        memory, _, src_mask = model.apply(
            variables,
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            self.max_frames, train=False, method=model.encode,
        )
        memory = memory[:1]
        src_mask = src_mask[:1]
        cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)
        return {"cross_kvs": cross_kvs, "src_mask": src_mask,
                "max_len": jnp.asarray(max_len, jnp.int32)}

    def _init_carry(self):
        """Fresh per-utterance search state (the while-loop carry)."""
        S, H, F, MW, W = self.S, self.H, self.F, self.MW, self.W
        lm = self.lm
        hist0 = jnp.full((H, S), 42, jnp.int32).at[:, 0].set(START_ID)
        cum0 = jnp.zeros((H,), jnp.float32)
        node0 = jnp.full((H,), self.root, jnp.int32)
        alive0 = jnp.zeros((H,), bool).at[0].set(True)
        ctx0 = lm.initial_ctx((H,))  # (H, order-1) oldest->newest
        runlm0 = jnp.zeros((H,), jnp.float32)
        chars0 = jnp.zeros((H,), jnp.int32)
        wc0 = jnp.zeros((H,), jnp.int32)
        words0 = jnp.full((H, MW), -1, jnp.int32)
        fin_scores0 = jnp.full((F,), NEG, jnp.float32)
        fin_hist0 = jnp.full((F, S), 42, jnp.int32)
        fin_words0 = jnp.full((F, MW), -1, jnp.int32)
        fin_wc0 = jnp.zeros((F,), jnp.int32)
        caches0 = self.model.init_decode_cache(W, S)
        psel0 = jnp.arange(W, dtype=jnp.int32)  # deferred cache row-reorder
        return (jnp.int32(0), hist0, cum0, node0, alive0, ctx0, runlm0,
                chars0, wc0, words0, fin_scores0, fin_hist0, fin_words0,
                fin_wc0, caches0, psel0)

    def _carry_done(self, sctx, carry):
        """True once this search can make no further progress."""
        t, alive = carry[0], carry[4]
        return (t >= sctx["max_len"]) | (t >= self.S - 1) | ~jnp.any(alive)

    def _step_fn(self):
        """The per-step transition body(variables, sctx, carry) -> carry."""
        model, cfg, lm = self.model, self.cfg, self.lm
        S, W, K, H, F, MW = self.S, self.W, self.K, self.H, self.F, self.MW
        end_tok = self.phone_count
        wt = cfg.LMWeight
        # expansion rows carry the same token history as their parent
        # (row i's parent is i mod W), so only the first W rows need a
        # decoder pass — a (1+K)x saving on the per-step transformer cost
        parent = jnp.arange(H) % W

        def body(variables, sctx, carry):
            def decode_lp(tokens, t, caches):
                """One incremental decoder step over the W decode rows:
                feeds the token at position t with cached K/V for positions
                0..t-1, returns (step log-probs, updated caches)."""
                token_in = jax.lax.dynamic_index_in_dim(
                    tokens, t, axis=1, keepdims=False
                )
                logits, caches = model.apply(
                    variables, token_in, t, caches, sctx["cross_kvs"],
                    tokens, sctx["src_mask"], method=model.decode_step,
                )
                return jax.nn.log_softmax(logits[:, :-2], axis=-1), caches

            (t, hist, cum, node, alive, ctx, runlm, chars, wc, words,
             fin_scores, fin_hist, fin_words, fin_wc, caches, psel) = carry

            # apply the PREVIOUS step's beam reorder to the K/V caches as a
            # one-hot matmul on the row axis. Measured (r5 probes, W=100,
            # S=33, T=384): the plain gather costs ~0.55 ms/step in loop
            # context (the while-carry loses in-place updates once a gather
            # intervenes) while the MXU selector matmul brings decode+
            # reorder to 0.356 ms/step — and it is EXACT: each output row
            # sums exactly one 1.0*k product, accumulated in float32.
            k0 = jax.tree.leaves(caches)[0]
            P = jax.nn.one_hot(psel, W, dtype=k0.dtype)  # (W, W)

            def _perm(c):
                flat = c.reshape(c.shape[0], W, -1)
                out = jnp.einsum("bj,ljf->lbf", P, flat,
                                 precision=jax.lax.Precision.HIGHEST)
                return out.reshape(c.shape)

            caches = jax.tree.map(_perm, caches)

            step_lp_w, caches = decode_lp(hist[:W], t, caches)  # (W, 41)
            step_lp = step_lp_w[parent]  # (H, 41)
            full = cum[:, None] + step_lp + self.mask_table[node]
            full = jnp.where(alive[:, None], full, NEG)

            vals, flat_idx = jax.lax.top_k(full.reshape(-1), W)
            hsel = flat_idx // full.shape[1]
            tok = (flat_idx % full.shape[1]).astype(jnp.int32)
            valid = jnp.isfinite(vals)

            new_cum = cum[hsel] + step_lp[hsel, tok]
            new_hist = hist[hsel]
            new_hist = jnp.where(
                jnp.arange(S)[None, :] == (t + 1), tok[:, None], new_hist
            )
            new_node = jnp.where(
                tok == end_tok,
                node[hsel],
                self.child_table[node[hsel], jnp.minimum(tok, self.phone_count - 1)],
            )
            new_ctx = ctx[hsel]
            new_runlm = runlm[hsel]
            new_chars = chars[hsel]
            new_wc = wc[hsel]
            new_words = words[hsel]

            # one batched LM call scores the eos continuation AND the K
            # word-boundary expansions together ((1+K, W) — the lookups
            # are fusion-count-bound, so one widened cond_logp beats two)
            exp_words_ids = self.node_words[new_node]  # (W, K)
            wid = exp_words_ids.T  # (K, W) lexicon word ids, -1 pad
            wid_s = jnp.maximum(wid, 0)
            lm_w = lm.lex2lm[wid_s]  # (K, W)
            ctx_b = jnp.broadcast_to(new_ctx[None], (K,) + new_ctx.shape)
            ctx_all = jnp.concatenate([new_ctx[None], ctx_b])  # (1+K, W, CW)
            w_all = jnp.concatenate(
                [jnp.full((1, W), lm.eos_id, lm_w.dtype), lm_w]
            )
            cond_all = lm.cond_logp(ctx_all, w_all)  # (1+K, W)
            eos_cond = cond_all[0]
            cond_w = cond_all[1:]  # (K, W)

            # finished hypotheses: score = mean(per-step probs) where the
            # last step also carries the eos LM + final length penalty
            ended = valid & (tok == end_tok)
            fin_add = (new_runlm + eos_cond
                       + (new_chars.astype(jnp.float32) + 1.0) ** cfg.FinalLengthPenalty) * wt
            fin_score = (new_cum + fin_add) / (t + 1).astype(jnp.float32)
            fin_score = jnp.where(ended, fin_score, NEG)
            # merge into the finished buffer (top-F by score)
            cat_scores = jnp.concatenate([fin_scores, fin_score])
            cat_hist = jnp.concatenate([fin_hist, new_hist])
            cat_words = jnp.concatenate([fin_words, new_words])
            cat_wc = jnp.concatenate([fin_wc, new_wc])
            top_scores, top_idx = jax.lax.top_k(cat_scores, F)
            fin_scores = top_scores
            fin_hist = cat_hist[top_idx]
            fin_words = cat_words[top_idx]
            fin_wc = cat_wc[top_idx]

            active = valid & ~ended

            # word-boundary expansions: duplicate each active hypo once
            # per word ending at its node, moved back to the root with
            # the running LM + length-penalty addition. All K expansion
            # slots are scored in ONE batched (K, W) pass — the row layout
            # [base, k=0, k=1, ...] (row h's parent is h % W) is identical
            # to the per-k loop this replaces, just fewer fusions per step
            # (wid/lm_w/cond_w come from the combined lookup above)
            has = active[None] & (wid >= 0) & (new_wc[None] < MW)
            runlm_k = new_runlm[None] + cond_w
            chars_k = (new_chars[None] + lm.word_chars[wid_s]
                       + jnp.where(new_wc[None] > 0, 1, 0))
            add = (runlm_k
                   + (chars_k.astype(jnp.float32) + 1.0) ** cfg.RunningLengthPenalty
                   ) * wt
            w_upd = jnp.where(
                jnp.arange(MW)[None, None, :] == new_wc[None, :, None],
                wid_s[:, :, None], new_words[None],
            )  # (K, W, MW)

            def flat2(base, exp):  # stack [base; k-major expansions]
                return jnp.concatenate(
                    [base, exp.reshape((K * W,) + exp.shape[2:])]
                )

            hist = jnp.tile(new_hist, (1 + K, 1))
            cum = flat2(new_cum, new_cum[None] + add)
            node = jnp.concatenate(
                [new_node, jnp.full((K * W,), self.root, jnp.int32)]
            )
            alive = flat2(active, has)
            ctx = flat2(new_ctx, lm.shift_ctx(ctx_b, lm_w))
            runlm = flat2(new_runlm, runlm_k)
            chars = flat2(new_chars, chars_k)
            wc = flat2(new_wc, jnp.broadcast_to(new_wc[None] + 1, (K, W)))
            words = flat2(new_words, w_upd)

            # re-align the K/V caches with the reordered decode rows:
            # the selected hypothesis hsel's prefix K/V live in cache row
            # hsel % W (expansion rows shared their parent's history). The
            # physical reorder is DEFERRED to the start of the next step
            # (one-hot matmul above) — carrying the selector costs W int32s
            # instead of a second full-cache pass.
            cache_sel = hsel % W

            return (t + 1, hist, cum, node, alive, ctx, runlm, chars, wc,
                    words, fin_scores, fin_hist, fin_words, fin_wc, caches,
                    cache_sel)

        return body

    def _run_search(self, body, variables, sctx):
        """Run the step loop to completion and return the winning hypothesis.

        Two trip-count strategies, picked by cfg.beam_scan:

        - "static": all S-1 steps as one lax.scan — steps past max_len
          are inert (``alive`` gated off, so no hypothesis can finish
          late; same semantics as the reference's range(max_len) loop).
        - "early_exit" (default, measured faster in both short and long
          regimes — benchmarks/beam_scan_tradeoff.py): a lax.while_loop
          that stops the moment the search can make no further progress
          (_carry_done). Outputs are identical either way
          (tests/test_device_beam.py::test_early_exit_matches_static)."""
        if self.cfg.beam_scan == "early_exit":
            def cond(carry):
                return ~self._carry_done(sctx, carry)

            out = jax.lax.while_loop(
                cond, lambda c: body(variables, sctx, c),
                self._init_carry(),
            )
        else:
            def sbody(carry, _):
                t, alive = carry[0], carry[4]
                alive = alive & (t < sctx["max_len"])
                carry = carry[:4] + (alive,) + carry[5:]
                return body(variables, sctx, carry), None

            out, _ = jax.lax.scan(
                sbody, self._init_carry(), None, length=self.S - 1
            )
        fin_scores, fin_hist, fin_words, fin_wc = out[self.FINISHED_SLOTS]
        best = jnp.argmax(fin_scores)
        return fin_scores[best], fin_hist[best], fin_words[best], fin_wc[best]

    def _build(self):
        body = self._step_fn()

        def search(variables, batch: PackedBatch, max_len):
            """One whole search in ONE program, returning only the winning
            hypothesis (single host fetch)."""
            sctx = self._make_ctx(variables, batch, max_len)
            return self._run_search(body, variables, sctx)

        self._search_fn_raw = search
        return jax.jit(search, static_argnums=())

    # ------------------------------------------------------------------
    def _build_raw(self, Tb: int):
        """Jitted raw-signal program for raw-sample bucket ``Tb``: device
        DSP -> soft clip -> row packing -> encoder -> beam, so serving an
        utterance uploads ONLY the (Tb, C) 1 kHz signal (~5x smaller than
        the padded row-pack the PackedBatch path ships, which dominates
        p50 on bandwidth-starved attachments)."""
        from emg_tpu.data.batching import PAD_VALUE
        from emg_tpu.dsp.features import n_frames as frames_of
        from emg_tpu.dsp.pipeline import (FEAT_RATE, SOURCE_RATE,
                                          preprocess_emg_batched)
        from emg_tpu.dsp.resample import subsample_length

        # static packing geometry: the most frames a Tb-sample utterance
        # can produce (clipped to the searcher's encoder bucket)
        F_cap = min(
            frames_of(subsample_length(Tb, FEAT_RATE, SOURCE_RATE)),
            self.max_frames,
        )
        rows_b = max(1, -(-(8 * F_cap) // 1600))
        body = self._step_fn()

        def search_raw(variables, buf, n, max_len):
            zeros1 = jnp.zeros((1,), jnp.int32)
            out = preprocess_emg_batched(buf[None], n[None], zeros1, zeros1, ())
            F = jnp.minimum(out.n_frames[0], F_cap).astype(jnp.int32)
            # reference raw-path transform (read_emg.py:426-428) and
            # alignment: emg_orig rows [8, 8+8F)
            raw = 50.0 * jnp.tanh(out.emg_orig[0] / 20.0 / 50.0)
            pos = jnp.arange(rows_b * 1600, dtype=jnp.int32)
            src = jnp.clip(pos + 8, 0, raw.shape[0] - 1)
            flat = jnp.where(
                (pos < 8 * F)[:, None], jnp.take(raw, src, axis=0), PAD_VALUE
            )
            batch = PackedBatch(
                packed_raw=flat.reshape(rows_b, 1600, raw.shape[1]),
                n_rows=(8 * F + 1599) // 1600,
                lengths=F[None],
                offsets=zeros1,
                targets=jnp.full((1, 1), 42, jnp.int32),
                target_lengths=jnp.ones((1,), jnp.int32),
                n_examples=jnp.int32(1),
            )
            sctx = self._make_ctx(variables, batch, max_len)
            return self._run_search(body, variables, sctx)

        return jax.jit(search_raw), rows_b

    def search_from_raw(self, raw: np.ndarray, target_len_tokens: int
                        ) -> Tuple[np.ndarray, float, List[str]]:
        """Same contract as ``search`` but from the raw 1 kHz EMG signal
        ((n, C) float32, no neighbor context): DSP, packing, encode and
        the whole beam run as ONE device program per raw-length bucket."""
        if not hasattr(self, "_raw_fns"):
            self._raw_fns = {}
        n, C = raw.shape
        Tb = bucket_up(n, RAW_SAMPLE_BUCKETS)
        if Tb not in self._raw_fns:
            self._raw_fns[Tb] = self._build_raw(Tb)
        fn, _ = self._raw_fns[Tb]
        buf = np.zeros((Tb, C), np.float32)
        buf[:n] = raw
        max_len = jnp.int32(int(target_len_tokens) + self.cfg.extra_steps)
        score, hist, words, wc = jax.device_get(
            fn(self.variables, jnp.asarray(buf), jnp.int32(n), max_len)
        )
        return self._format(score, hist, words, wc)

    # ------------------------------------------------------------------
    def search_many(self, batches: List[PackedBatch], target_lens: List[int]):
        """Decode several single-utterance batches in ONE launch via vmap
        (all PackedBatches must share static shapes — bucket upstream).
        Returns a list of (history, score, words) like ``search``.

        Note: vmap runs the searches in lock-step until the longest one
        finishes; on this hardware the single-utterance path is already
        compute-bound, so batching helps only when launch latency dominates
        (many very short searches) — measure before preferring this."""
        if self._search_fn_raw is None:
            self._search_fn = self._build()
        if self._vsearch_fn is None:
            self._vsearch_fn = jax.jit(jax.vmap(
                self._search_fn_raw, in_axes=(None, 0, 0)
            ))
        import jax.tree_util as jtu

        stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *batches)
        max_lens = jnp.asarray(
            [int(t) + self.cfg.extra_steps for t in target_lens], jnp.int32
        )
        # one fetch for the whole launch (per-array host pulls each cost a
        # tunnel round trip)
        scores, hists, words, wcs = jax.device_get(
            self._vsearch_fn(self.variables, stacked, max_lens)
        )
        results = []
        for b in range(len(batches)):
            results.append(self._format(
                scores[b], hists[b], words[b], wcs[b],
            ))
        return results

    def _format(self, score, hist, words, wc):
        """(score, winning history, words, word count) -> search() output."""
        if not np.isfinite(score):
            return np.array([START_ID, self.phone_count]), -np.inf, []
        ends = np.where(hist == self.phone_count)[0]
        hist = hist[: ends[0] + 1] if len(ends) else hist
        names = [
            self.tree.dictionary.lookup_word_by_index(int(w)).name
            for w in words[: int(wc)]
        ]
        return hist, float(score), names

    def search(self, batch: PackedBatch, target_len_tokens: int
               ) -> Tuple[np.ndarray, float, List[str]]:
        """Same contract as BeamSearcher.search."""
        if self._search_fn is None:
            self._search_fn = self._build()
        max_len = jnp.int32(int(target_len_tokens) + self.cfg.extra_steps)
        score, hist, words, wc = jax.device_get(
            self._search_fn(self.variables, batch, max_len)
        )
        return self._format(score, hist, words, wc)
