"""Device-resident n-gram language model: ARPA -> hash tables -> gathers.

Katz-backoff scoring (the KenLM/ngram.py contract) expressed branchlessly
over dense arrays so the beam search can score word continuations inside a
jitted program: unigram probs/backoffs are direct gathers; bigram and
trigram entries live in open-addressing hash tables probed with a fixed
number of steps (table sizing guarantees every key is found within the
probe budget at build time).

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


def _build_pair_table(k1s, k2s, values, backoffs):
    """Open-addressing table keyed by an (int32, int32) pair — no packing,
    so arbitrary vocabulary sizes cannot overflow or alias. Grows until
    every key fits within MAX_PROBES probes.
    Returns (t1, t2, tvals, tbos, size)."""
    n = max(len(k1s), 1)
    size = 1
    while size < 2 * n:
        size *= 2
    while True:
        t1 = np.full(size, -1, np.int32)
        t2 = np.full(size, -1, np.int32)
        tvals = np.zeros(size, np.float32)
        tbos = np.zeros(size, np.float32)
        ok = True
        for k1, k2, v, b in zip(k1s, k2s, values, backoffs):
            h = int(_pair_hash_host(int(k1), int(k2), size))
            for probe in range(MAX_PROBES):
                slot = (h + probe) % size
                if t1[slot] == -1:
                    t1[slot] = k1
                    t2[slot] = k2
                    tvals[slot] = v
                    tbos[slot] = b
                    break
            else:
                ok = False
                break
        if ok:
            return t1, t2, tvals, tbos, size
        size *= 2


def _pair_hash_host(k1: int, k2: int, size: int) -> int:
    with np.errstate(over="ignore"):
        mixed = np.uint32(np.uint64(k1) * 1000003 + np.uint64(k2))
        return int((np.uint64(mixed) * 2654435761) % (2 ** 32) % size)


def _triple_hash_host(k1: int, k2: int, k3: int, size: int) -> int:
    with np.errstate(over="ignore"):
        inner = np.uint32(np.uint64(k1) * 1000003 + np.uint64(k2))
        mixed = np.uint32(np.uint64(inner) * 1000003 + np.uint64(k3))
        return int((np.uint64(mixed) * 2654435761) % (2 ** 32) % size)


def _build_triple_table(k1s, k2s, k3s, values):
    """Open-addressing table keyed by an int32 triple (trigram entries)."""
    n = max(len(k1s), 1)
    size = 1
    while size < 2 * n:
        size *= 2
    while True:
        t1 = np.full(size, -1, np.int32)
        t2 = np.full(size, -1, np.int32)
        t3 = np.full(size, -1, np.int32)
        tv = np.zeros(size, np.float32)
        ok = True
        for k1, k2, k3, v in zip(k1s, k2s, k3s, values):
            h = _triple_hash_host(int(k1), int(k2), int(k3), size)
            for probe in range(MAX_PROBES):
                slot = (h + probe) % size
                if t1[slot] == -1:
                    t1[slot] = k1
                    t2[slot] = k2
                    t3[slot] = k3
                    tv[slot] = v
                    break
            else:
                ok = False
                break
        if ok:
            return t1, t2, t3, tv, size
        size *= 2


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
    bi_k1: jnp.ndarray  # context word
    bi_k2: jnp.ndarray  # word
    bi_vals: jnp.ndarray
    bi_bos: jnp.ndarray
    bi_size: int
    tri_k1: jnp.ndarray  # c1
    tri_k2: jnp.ndarray  # c2
    tri_k3: jnp.ndarray  # w
    tri_vals: jnp.ndarray
    tri_size: int
    n_lm: int

    # -- device-side queries -------------------------------------------------
    def _probe(self, tkeys, h, match_fn):
        found = jnp.zeros(h.shape, bool)
        slot = jnp.zeros(h.shape, jnp.int32)
        for p in range(MAX_PROBES):
            s = (h + p) % tkeys.shape[0]
            hit = match_fn(s) & ~found
            slot = jnp.where(hit, s, slot)
            found = found | hit
        return found, slot

    @staticmethod
    def _pair_hash(k1, k2, size):
        mixed = k1.astype(jnp.uint32) * jnp.uint32(1000003) + k2.astype(jnp.uint32)
        return ((mixed * jnp.uint32(2654435761)) % jnp.uint32(size)).astype(jnp.int32)

    def bi_lookup(self, c, w):
        """Returns (found, logp, backoff) for LM-id bigram (c, w)."""
        h = self._pair_hash(c, w, self.bi_size)
        found, slot = self._probe(
            self.bi_k1, h, lambda s: (self.bi_k1[s] == c) & (self.bi_k2[s] == w)
        )
        return found, self.bi_vals[slot], self.bi_bos[slot]

    def tri_lookup(self, c1, c2, w):
        # two-level pair hash: mix (c1, c2) first, then the word
        inner = (c1.astype(jnp.uint32) * jnp.uint32(1000003)
                 + c2.astype(jnp.uint32))
        mixed = inner * jnp.uint32(1000003) + w.astype(jnp.uint32)
        h = ((mixed * jnp.uint32(2654435761)) % jnp.uint32(self.tri_size)).astype(jnp.int32)
        found, slot = self._probe(
            self.tri_k1, h,
            lambda s: (self.tri_k1[s] == c1) & (self.tri_k2[s] == c2)
            & (self.tri_k3[s] == w),
        )
        return found, self.tri_vals[slot]

    def cond_logp(self, c1, c2, w):
        """log10 p(w | c1, c2) with Katz backoff, all LM ids; c1/c2 may be
        -1 (absent context -> skip that level)."""
        c1 = jnp.maximum(c1, 0) * 0 + c1  # keep dtype
        has_c1 = c1 >= 0
        has_c2 = c2 >= 0
        c1s = jnp.where(has_c1, c1, 0)
        c2s = jnp.where(has_c2, c2, 0)

        uni = self.uni_logp[w]
        bo_c2 = jnp.where(has_c2, self.uni_bo[c2s], 0.0)
        bi_found, bi_val, _ = self.bi_lookup(c2s, w)
        bi_found = bi_found & has_c2
        level2 = jnp.where(bi_found, bi_val, bo_c2 + uni)

        if self.order < 3:
            return level2
        tri_found, tri_val = self.tri_lookup(c1s, c2s, w)
        tri_found = tri_found & has_c1 & has_c2
        # backoff weight of context (c1, c2) lives on the bigram entry
        ctx_found, _, ctx_bo = self.bi_lookup(c1s, c2s)
        bo_ctx = jnp.where(ctx_found & has_c1 & has_c2, ctx_bo, 0.0)
        return jnp.where(tri_found, tri_val, bo_ctx + level2)


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
    # words missing from the LM score as <unk>
    if uni_logp[unk] == -99.0 and (UNK,) not in lm.ngrams[1]:
        uni_logp[unk] = -99.0

    def wid(w: str) -> int:
        return lm_id.get(w, unk)

    bi_c, bi_w, bi_vals, bi_bos = [], [], [], []
    if lm.order >= 2:
        for (c, w), (p, b) in lm.ngrams[2].items():
            bi_c.append(wid(c))
            bi_w.append(wid(w))
            bi_vals.append(p)
            bi_bos.append(b)
    bk1, bk2, bv, bb, bi_size = _build_pair_table(bi_c, bi_w, bi_vals, bi_bos)

    tri_c1, tri_c2, tri_w, tri_vals = [], [], [], []
    if lm.order >= 3:
        for (c1, c2, w), (p, _) in lm.ngrams[3].items():
            tri_c1.append(wid(c1))
            tri_c2.append(wid(c2))
            tri_w.append(wid(w))
            tri_vals.append(p)
    t1, t2, t3, tv, size = _build_triple_table(tri_c1, tri_c2, tri_w, tri_vals)

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
        bi_k1=jnp.asarray(bk1),
        bi_k2=jnp.asarray(bk2),
        bi_vals=jnp.asarray(bv),
        bi_bos=jnp.asarray(bb),
        bi_size=bi_size,
        tri_k1=jnp.asarray(t1),
        tri_k2=jnp.asarray(t2),
        tri_k3=jnp.asarray(t3),
        tri_vals=jnp.asarray(tv),
        tri_size=size,
        n_lm=n_lm,
    )
