"""Torch-CPU baseline: an equivalent EMG->phoneme stack for bench ratios.

This reconstructs the reference's compute path (scipy filtfilt DSP chain,
ResBlock CNN + transformer encoder-decoder with relative positional
attention, full-prefix greedy decode) in idiomatic torch on CPU, sized
identically to the flagship config, so bench.py can report a fair
utterances/sec ratio on identical synthetic inputs. Built from the same
formula-level understanding used by the test oracles; not a vendored copy.
"""

from __future__ import annotations

import math
import time

import numpy as np
import scipy.signal
import torch
import torch.nn as nn
import torch.nn.functional as F


def dsp_chain(raw: np.ndarray) -> np.ndarray:
    """Notch harmonics + drift removal + dual resample + featurization."""
    x = raw.astype(np.float64)
    for h in range(1, 8):
        b, a = scipy.signal.iirnotch(60.0 * h, 30, 1000.0)
        x = scipy.signal.filtfilt(b, a, x, axis=0)
    b, a = scipy.signal.butter(3, 2, "highpass", fs=1000.0)
    x = scipy.signal.filtfilt(b, a, x, axis=0)

    def subsample(sig, new):
        times = np.arange(len(sig)) / 1000.0
        st = np.arange(0, times[-1], 1.0 / new)
        return np.stack([np.interp(st, times, sig[:, c]) for c in range(sig.shape[1])], 1)

    emg_orig = subsample(x, 689.06)
    emg = subsample(x, 516.79)
    feats = _emg_features(emg)
    return feats, emg_orig.astype(np.float32)


def _emg_features(emg: np.ndarray) -> np.ndarray:
    xs = emg - emg.mean(axis=0, keepdims=True)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(16) / 16)

    def frame(v):
        n = 1 + (len(v) - 16) // 6
        idx = np.arange(n)[:, None] * 6 + np.arange(16)[None, :]
        return v[idx]

    feats = []
    for i in range(emg.shape[1]):
        x = xs[:, i]
        f9 = np.ones(9) / 9.0
        w = np.convolve(np.convolve(x, f9, "same"), f9, "same")
        p = x - w
        r = np.abs(p)
        fw, fp, fr, fx = frame(w), frame(p), frame(r), frame(x)
        z = fp.copy()
        z[np.abs(z) <= 1e-10] = 0
        sign = np.signbit(z)
        d = sign[:, 1:] != sign[:, :-1]
        zc = np.concatenate([d[:, :1], d], 1).mean(1)
        feats.append(
            np.stack([fw.mean(1), np.sqrt((fw**2).mean(1)), np.sqrt((fr**2).mean(1)), zc, fr.mean(1)], 1)
        )
        feats.append(np.abs(np.fft.rfft(fx * hann, n=16, axis=1)))
    return np.concatenate(feats, 1).astype(np.float32)


class TResBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.c1 = nn.Conv1d(cin, cout, 3, padding=1, stride=stride)
        self.b1 = nn.BatchNorm1d(cout)
        self.c2 = nn.Conv1d(cout, cout, 3, padding=1)
        self.b2 = nn.BatchNorm1d(cout)
        self.cr = nn.Conv1d(cin, cout, 1, stride=stride)
        self.br = nn.BatchNorm1d(cout)

    def forward(self, x):
        h = F.relu(self.b1(self.c1(x)))
        h = self.b2(self.c2(h))
        return F.relu(h + self.br(self.cr(x)))


class TRelMHA(nn.Module):
    def __init__(self, d, h, maxpos=300, rel=True):
        super().__init__()
        dh = d // h
        self.h, self.dh, self.maxpos, self.rel = h, dh, maxpos, rel
        self.wq = nn.Parameter(torch.randn(h, d, dh) * 0.005)
        self.wk = nn.Parameter(torch.randn(h, d, dh) * 0.005)
        self.wv = nn.Parameter(torch.randn(h, d, dh) * 0.005)
        self.wo = nn.Parameter(torch.randn(h, dh, d) * 0.005)
        if rel:
            self.emb = nn.Parameter(torch.randn(h, 2 * maxpos - 1, dh) * dh ** -0.5)

    def forward(self, q_in, k_in, v_in, causal=False):
        q = torch.einsum("btf,hfa->bhta", q_in, self.wq)
        k = torch.einsum("btf,hfa->bhta", k_in, self.wk)
        v = torch.einsum("btf,hfa->bhta", v_in, self.wv)
        logits = torch.einsum("bhqa,bhka->bhqk", q, k) / (self.dh ** 0.5)
        L = logits.shape[-1]
        if causal:
            cm = torch.tril(torch.ones(logits.shape[2], L, dtype=torch.bool))
            logits = logits.masked_fill(~cm, -1e8)
        if self.rel:
            Lq = q.shape[2]
            pad = max(Lq - self.maxpos, 0)
            start = max(self.maxpos - Lq, 0)
            table = F.pad(self.emb, (0, 0, pad, pad))[:, start : start + 2 * Lq - 1]
            r = torch.einsum("bhld,hmd->bhlm", q, table)
            r = F.pad(r, (0, 1)).reshape(r.shape[0], r.shape[1], -1)
            r = F.pad(r, (0, Lq - 1)).reshape(r.shape[0], r.shape[1], Lq + 1, 2 * Lq - 1)
            logits = logits + r[:, :, :Lq, Lq - 1 :]
        probs = torch.softmax(logits, -1)
        o = torch.einsum("bhqk,bhka->bhqa", probs, v)
        return torch.einsum("bhta,haf->btf", o, self.wo)


class TEncLayer(nn.Module):
    def __init__(self, d, h, ff, maxpos):
        super().__init__()
        self.attn = TRelMHA(d, h, maxpos, rel=True)
        self.l1, self.l2 = nn.Linear(d, ff), nn.Linear(ff, d)
        self.n1, self.n2 = nn.LayerNorm(d), nn.LayerNorm(d)

    def forward(self, x):
        x = self.n1(x + self.attn(x, x, x))
        x = self.n2(x + self.l2(F.relu(self.l1(x))))
        return x


class TDecLayer(nn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.sa = TRelMHA(d, h, rel=False)
        self.ca = TRelMHA(d, h, rel=False)
        self.l1, self.l2 = nn.Linear(d, ff), nn.Linear(ff, d)
        self.n1, self.n2, self.n3 = nn.LayerNorm(d), nn.LayerNorm(d), nn.LayerNorm(d)

    def forward(self, x, mem):
        x = self.n1(x + self.sa(x, x, x, causal=True))
        x = self.n2(x + self.ca(x, mem, mem))
        x = self.n3(x + self.l2(F.relu(self.l1(x))))
        return x


class TorchBaselineModel(nn.Module):
    def __init__(self, d=768, ff=3072, layers=6, heads=8, maxpos=300):
        super().__init__()
        self.convs = nn.Sequential(
            TResBlock(8, d, 2), TResBlock(d, d, 2), TResBlock(d, d, 2)
        )
        self.w_raw_in = nn.Linear(d, d)
        self.enc = nn.ModuleList([TEncLayer(d, heads, ff, maxpos) for _ in range(layers)])
        self.dec = nn.ModuleList([TDecLayer(d, heads, ff) for _ in range(layers)])
        self.embed = nn.Embedding(43, d, padding_idx=42)
        self.w_aux = nn.Linear(d, 44)
        self.w_out = nn.Linear(d, 43)
        d_model = d
        pe = torch.zeros(5000, d_model)
        pos = torch.arange(0, 5000, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)
        self.d = d

    def encode(self, packed):  # (N, L, 8)
        x = self.convs(packed.transpose(1, 2)).transpose(1, 2)
        x = self.w_raw_in(x)
        mem = x.reshape(1, -1, self.d)
        for layer in self.enc:
            mem = layer(mem)
        return mem

    def decode_step(self, tokens, mem):
        t = self.embed(tokens) + (1.0 / self.d) * self.pe[: tokens.shape[1]][None]
        for layer in self.dec:
            t = layer(t, mem)
        return self.w_out(t)

    @torch.no_grad()
    def greedy(self, packed, max_steps=40):
        mem = self.encode(packed)
        tokens = torch.full((1, 1), 41, dtype=torch.long)
        for _ in range(max_steps):
            logits = self.decode_step(tokens, mem)
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            tokens = torch.cat([tokens, nxt], 1)
            if int(nxt) == 40:
                break
        return tokens


def measure_baseline(utterances, max_steps=40) -> float:
    """End-to-end utt/sec on CPU: DSP + encode + greedy, batch size 1."""
    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = TorchBaselineModel().eval()
    t0 = time.time()
    for raw in utterances:
        feats, emg_orig = dsp_chain(raw)
        emg_orig = np.tanh(emg_orig / 20.0 / 50.0) * 50.0
        total = emg_orig.shape[0]
        rows = (total + 1599) // 1600
        buf = np.full((rows * 1600, 8), 42.0, np.float32)
        buf[:total] = emg_orig
        packed = torch.tensor(buf.reshape(rows, 1600, 8))
        model.greedy(packed, max_steps)
    dt = time.time() - t0
    return len(utterances) / dt
