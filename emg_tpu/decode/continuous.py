"""Continuous-batching beam-search serving.

``DeviceBeamSearcher.search_many`` vmaps whole searches in lock-step: a
batch of utterances finishes when its SLOWEST member does, so short
searches idle in their lanes. This server instead advances a fixed pool of
lanes a small CHUNK of beam steps per launch; whenever a lane's search
completes, its result is emitted and the next queued utterance takes the
lane immediately — the device never waits on stragglers and the decoder
rows stay full (the continuous-batching discipline of modern LLM serving,
applied to the reference's beam decode, BeamSearch.py:41-170).

Mechanics: the per-step transition is the same ``body`` the one-shot
searcher runs (decode/device_beam.py); here it runs under ``vmap`` across
lanes inside a bounded while_loop ("advance up to ``chunk`` steps, skipping
lanes that are done"). Completed lanes are detected host-side from a tiny
flag transfer, refilled by re-encoding the next utterance into the lane's
search context, and their carry reset — all pure array updates at one lane
index, so lane swaps never recompile.

A finished lane left in the pool is inert by construction: its ``alive``
mask is all-False, every candidate score is -inf, and nothing reaches its
finished-hypothesis buffers, so lock-step execution of mixed lanes is
semantically safe (tested against one-by-one ``search``)."""

from __future__ import annotations

import functools
from typing import Iterable, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from emg_tpu.data.batching import PackedBatch
from emg_tpu.decode.device_beam import DeviceBeamSearcher


class ContinuousBeamServer:
    def __init__(self, searcher: DeviceBeamSearcher, lanes: int = 8,
                 chunk: int = 16):
        """``lanes``: searches resident on device at once. ``chunk``: beam
        steps per advance launch — the refill latency granularity (smaller
        = faster refill, more launches)."""
        assert lanes >= 1 and chunk >= 1
        self.searcher = searcher
        self.lanes = lanes
        self.chunk = chunk

        body = searcher._step_fn()

        def advance_one(variables, sctx, carry):
            """Run ``chunk`` steps of one lane as a static scan (a finished
            or retired lane is inert: its ``alive`` mask is gated off, so
            extra steps change nothing it emits — and static trip counts
            avoid the while_loop's host-synced condition on
            dispatch-latency-bound links)."""

            def sbody(c, _):
                t, alive = c[0], c[4]
                # gate on BOTH bounds _carry_done checks: max_len AND the
                # cache capacity S-1. A chunked lane whose request asks for
                # max_len > S-1 would otherwise keep stepping past cache
                # capacity (dynamic_update_slice clamps to the last cache
                # row, corrupting it) and could push late hypotheses into
                # the finished buffer, diverging from one-shot search()
                alive = (alive & (t < sctx["max_len"])
                         & (t < searcher.S - 1))
                c = c[:4] + (alive,) + c[5:]
                return body(variables, sctx, c), None

            out, _ = jax.lax.scan(sbody, carry, None, length=chunk)
            return out, searcher._carry_done(sctx, out)

        self._advance = jax.jit(jax.vmap(advance_one, in_axes=(None, 0, 0)))
        self._ctx_fn = jax.jit(searcher._make_ctx)
        self._carry_template = None

        # single-dispatch lane swap: one XLA program updating every leaf at
        # ``lane`` with the input buffers donated (in-place on device) —
        # eager per-array .at[].set() costs one dispatch + full copy per
        # leaf, which dominates refill time on high-latency links
        @functools.partial(jax.jit, donate_argnums=(0,))
        def set_lane(stacked, lane, value):
            return jax.tree.map(lambda s, v: s.at[lane].set(v), stacked, value)

        self._set_lane = set_lane

    # -- lane state helpers -------------------------------------------------
    def _fresh_carry(self):
        if self._carry_template is None:
            self._carry_template = self.searcher._init_carry()
        return self._carry_template

    # -- serving loop -------------------------------------------------------
    def serve(self, requests: Iterable[Tuple[PackedBatch, int]]
              ) -> List[Tuple[np.ndarray, float, List[str]]]:
        """Decode a stream of (batch, target_len_tokens) requests.

        Returns results in REQUEST order (same contract as
        ``DeviceBeamSearcher.search`` per item). All batches must share
        static shapes (bucket upstream, as for search_many)."""
        searcher = self.searcher
        queue = list(requests)
        n = len(queue)
        if n == 0:
            return []
        L = min(self.lanes, n)

        def encode(req):
            batch, tlen = req
            return self._ctx_fn(
                searcher.variables, batch,
                int(tlen) + searcher.cfg.extra_steps,
            )

        # prefill
        next_req = 0
        lane_req = [-1] * L  # request index occupying each lane
        ctxs_l, carrys_l = [], []
        for lane in range(L):
            ctxs_l.append(encode(queue[next_req]))
            carrys_l.append(self._fresh_carry())
            lane_req[lane] = next_req
            next_req += 1
        ctxs = jax.tree.map(lambda *xs: jnp.stack(xs), *ctxs_l)
        carrys = jax.tree.map(lambda *xs: jnp.stack(xs), *carrys_l)

        results: List = [None] * n
        active = L
        while active > 0:
            carrys, done = self._advance(searcher.variables, ctxs, carrys)
            done_np = np.asarray(done)
            finished = [lane for lane in range(L)
                        if done_np[lane] and lane_req[lane] >= 0]
            if not finished:
                continue
            # pull the finished lanes' result buffers in ONE host fetch
            fin_scores, fin_hist, fin_words, fin_wc = jax.device_get((
                carrys[DeviceBeamSearcher.SLOT_FIN_SCORES],
                carrys[DeviceBeamSearcher.SLOT_FIN_HIST],
                carrys[DeviceBeamSearcher.SLOT_FIN_WORDS],
                carrys[DeviceBeamSearcher.SLOT_FIN_WC],
            ))
            for lane in finished:
                req = lane_req[lane]
                best = int(np.argmax(fin_scores[lane]))
                results[req] = searcher._format(
                    fin_scores[lane][best], fin_hist[lane][best],
                    fin_words[lane][best], fin_wc[lane][best],
                )
                if next_req < n:  # refill the lane with the next request
                    lane_t = jnp.int32(lane)  # traced: one trace per swap fn
                    ctxs = self._set_lane(ctxs, lane_t, encode(queue[next_req]))
                    carrys = self._set_lane(carrys, lane_t, self._fresh_carry())
                    lane_req[lane] = next_req
                    next_req += 1
                else:  # retire the lane (stays inert: alive all-False)
                    lane_req[lane] = -1
                    active -= 1
        return results
