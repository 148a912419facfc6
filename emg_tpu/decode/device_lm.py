"""Device-resident n-gram language model: ARPA -> hash tables -> gathers.

Katz-backoff scoring (the KenLM/ngram.py contract, PrefixTree.py:288-290)
expressed branchlessly over dense arrays so the beam search can score word
continuations inside a jitted program: unigram probs/backoffs are direct
gathers; every higher level 2..N lives in an open-addressing hash table
keyed by the n-gram's word-id tuple and probed with a fixed number of steps
(table sizing guarantees every key is found within the probe budget at
build time). The order is taken from the ARPA file — a 4- or 5-gram model
scores at its full order on device, matching the host scorer exactly.

Word identity: callers use *lexicon* word ids; the build maps them onto the
LM's vocabulary (OOV -> <unk>) so device code never touches strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

import jax.numpy as jnp

from emg_tpu.decode.ngram import BOS, EOS, UNK, ArpaLanguageModel

MAX_PROBES = 16


def _tuple_hash_host(keys, size: int) -> int:
    """Iterative uint32 mixing, identical (mod 2^32) to the device hash."""
    with np.errstate(over="ignore"):
        h = np.uint32(int(keys[0]) % (2**32))
        for k in keys[1:]:
            h = np.uint32((np.uint64(h) * 1000003 + np.uint64(int(k))) % (2**32))
        return int((np.uint64(h) * 2654435761) % (2**32) % size)


def _build_tuple_table(columns: Sequence[Sequence[int]], values, backoffs):
    """Open-addressing table keyed by an int32 k-tuple (one entry per
    n-gram). ``columns`` is a sequence of k equal-length id sequences.
    Grows until every key fits within MAX_PROBES probes.
    Returns (keys (size, k) int32, vals, bos, size)."""
    k = len(columns)
    n = max(len(columns[0]) if columns else 0, 1)
    size = 1
    while size < 2 * n:
        size *= 2
    rows = list(zip(*columns)) if columns and len(columns[0]) else []
    while True:
        keys = np.full((size, k), -1, np.int32)
        tvals = np.zeros(size, np.float32)
        tbos = np.zeros(size, np.float32)
        ok = True
        for row, v, b in zip(rows, values, backoffs):
            h = _tuple_hash_host(row, size)
            for probe in range(MAX_PROBES):
                slot = (h + probe) % size
                if keys[slot, 0] == -1:
                    keys[slot] = row
                    tvals[slot] = v
                    tbos[slot] = b
                    break
            else:
                ok = False
                break
        if ok:
            return keys, tvals, tbos, size
        size *= 2


@dataclass
class NgramTable:
    """One hash table for all n-grams of a single order."""

    keys: jnp.ndarray  # (size, k) int32, -1-filled empty slots
    vals: jnp.ndarray  # (size,) log10 prob
    bos: jnp.ndarray  # (size,) log10 backoff weight
    size: int


@dataclass
class DeviceLM:
    """All-arrays LM state (jnp arrays, ready for closure capture)."""

    order: int
    n_words: int  # lexicon vocabulary size (device id space)
    lex2lm: jnp.ndarray  # (n_words + 3,) lexicon id -> LM id
    bos_id: int
    eos_id: int
    word_chars: jnp.ndarray  # (n_words + 3,) characters per lexicon word
    uni_logp: jnp.ndarray  # (n_lm,)
    uni_bo: jnp.ndarray  # (n_lm,)
    tables: List[NgramTable]  # tables[i] holds the (i+2)-grams
    n_lm: int

    @property
    def ctx_width(self) -> int:
        """Context words a caller must carry (>=1 even for unigram LMs)."""
        return max(self.order - 1, 1)

    # -- device-side queries -------------------------------------------------
    @staticmethod
    def _tuple_hash(cols, size: int):
        h = cols[0].astype(jnp.uint32)
        for c in cols[1:]:
            h = h * jnp.uint32(1000003) + c.astype(jnp.uint32)
        return ((h * jnp.uint32(2654435761)) % jnp.uint32(size)).astype(jnp.int32)

    def _lookup(self, level: int, cols):
        """Probe the table holding ``level``-grams with the id tuple ``cols``
        (len(cols) == level). Returns (found, logp, backoff).

        All MAX_PROBES slots are examined in ONE widened gather instead of
        a sequential probe loop: the loop form cost ~3 fusions per probe
        (~50 per lookup), and at beam serving rates the LM lookups were
        ~0.4 ms of every step (measured v5e 2026-08-19) — fusion-count
        overhead, not memory traffic. Open addressing never stores
        duplicate keys, so "any hit" equals the loop's first-hit rule."""
        t = self.tables[level - 2]
        h = self._tuple_hash(cols, t.size)
        s = (h[..., None] + jnp.arange(MAX_PROBES, dtype=jnp.int32)) % t.size
        ks = t.keys[s]  # (..., P, k)
        tgt = jnp.stack(cols, axis=-1)[..., None, :]  # (..., 1, k)
        hit = jnp.all(ks == tgt, axis=-1)  # (..., P)
        found = jnp.any(hit, axis=-1)
        first = jnp.argmax(hit, axis=-1)  # 0 when no hit (gated by found)
        slot = jnp.take_along_axis(s, first[..., None], axis=-1)[..., 0]
        return found, t.vals[slot], t.bos[slot]

    def cond_logp(self, ctx, w):
        """log10 p(w | ctx) with Katz backoff, all LM ids.

        ``ctx``: (..., ctx_width) context ids ordered oldest -> newest; -1
        marks absent slots (contexts fill from the right, so an absent
        oldest slot implies every older slot is absent too). ``w``: (...).
        Matches ArpaLanguageModel._word_score exactly at any order.
        """
        score = self.uni_logp[w]
        CW = ctx.shape[-1]
        for k in range(2, self.order + 1):
            c_cols = [ctx[..., CW - (k - 1) + j] for j in range(k - 1)]
            has = c_cols[0] >= 0  # oldest needed slot present => all present
            cs = [jnp.maximum(c, 0) for c in c_cols]
            found, val, _ = self._lookup(k, cs + [w])
            found = found & has
            # backoff weight of the (k-1)-word context
            if k == 2:
                bo = jnp.where(has, self.uni_bo[cs[0]], 0.0)
            else:
                ctx_found, _, ctx_bo = self._lookup(k - 1, cs)
                bo = jnp.where(ctx_found & has, ctx_bo, 0.0)
            score = jnp.where(found, val, bo + score)
        return score

    def shift_ctx(self, ctx, new_word):
        """Append ``new_word`` to each context, dropping the oldest slot."""
        return jnp.concatenate([ctx[..., 1:], new_word[..., None]], axis=-1)

    def initial_ctx(self, shape) -> jnp.ndarray:
        """(-1, ..., -1, <s>) contexts of the LM's width."""
        ctx = jnp.full(tuple(shape) + (self.ctx_width,), -1, jnp.int32)
        return ctx.at[..., -1].set(self.bos_id)


def build_device_lm(lm: ArpaLanguageModel, lexicon_words: Sequence[str]) -> DeviceLM:
    """Compile an ArpaLanguageModel into device tables over a lexicon
    vocabulary (device word id = index into lexicon_words)."""
    vocab: List[str] = []
    lm_id = {}

    def intern(w: str) -> int:
        if w not in lm_id:
            lm_id[w] = len(vocab)
            vocab.append(w)
        return lm_id[w]

    for (w,) in lm.ngrams[1]:
        intern(w)
    for special in (UNK, BOS, EOS):
        intern(special)
    n_lm = len(vocab)
    unk = lm_id[UNK]

    uni_logp = np.full(n_lm, -99.0, np.float32)
    uni_bo = np.zeros(n_lm, np.float32)
    for (w,), (p, b) in lm.ngrams[1].items():
        uni_logp[lm_id[w]] = p
        uni_bo[lm_id[w]] = b

    def wid(w: str) -> int:
        return lm_id.get(w, unk)

    tables: List[NgramTable] = []
    for k in range(2, lm.order + 1):
        cols = [[] for _ in range(k)]
        vals, bos = [], []
        grams = lm.ngrams[k] if k < len(lm.ngrams) else {}
        for gram, (p, b) in grams.items():
            for j, w in enumerate(gram):
                cols[j].append(wid(w))
            vals.append(p)
            bos.append(b)
        keys, tv, tb, size = _build_tuple_table(cols, vals, bos)
        tables.append(NgramTable(
            keys=jnp.asarray(keys), vals=jnp.asarray(tv), bos=jnp.asarray(tb),
            size=size,
        ))

    n_words = len(lexicon_words)
    lex2lm = np.zeros(n_words + 3, np.int32)
    chars = np.zeros(n_words + 3, np.int32)
    for i, w in enumerate(lexicon_words):
        lex2lm[i] = wid(w.lower())
        chars[i] = len(w)
    return DeviceLM(
        order=lm.order,
        n_words=n_words,
        lex2lm=jnp.asarray(lex2lm),
        bos_id=lm_id[BOS],
        eos_id=lm_id[EOS],
        word_chars=jnp.asarray(chars),
        uni_logp=jnp.asarray(uni_logp),
        uni_bo=jnp.asarray(uni_bo),
        tables=tables,
        n_lm=n_lm,
    )
