"""Long-form decoding: windowed linear-compute encoding + blank-aligned
segmentation + per-segment joint beam search.

The fixed-shape joint search (decode/beam.py) allocates hypothesis and
KV-cache state proportional to T_enc x max_len, which exhausts HBM for
utterances beyond ~60 s at the baseline-recipe scale; and the offline
conformer's full-attention encoder is O(T^2) compute/memory, which walls
out around 2-3 min even without the search (tools/bench_longform.py).
The reference has no long-form story at all — its python beam loop just
gets slower (and its recipes filter audio at max_duration=30 s,
dataset.py:266-278).  This decoder makes hour-scale audio tractable
TPU-natively:

  1. windowed encoder forward: the input features are split into
     fixed-shape windows with a halo of context on each side; only the
     center outputs are kept, so compute and memory are LINEAR in audio
     length and every window reuses one compiled shape.  The conv
     subsampling stack (stride 4, receptive field 7) is translation-
     equivariant, so center outputs align exactly with the full forward;
     only attention context is truncated at +/- halo, which the halo
     makes negligible (windowed == full-forward tokens on trained
     models, tests/test_decode.py).  Short inputs take the plain full
     forward;
  2. segment cut points chosen at the most blank-dominated frame inside
     a window around each nominal boundary — CTC blank posteriors are a
     free silence detector, so segments don't split words;
  3. each segment is bucket-padded to ``segment_frames`` and decoded by
     the SAME fixed-shape search (one compile for the whole stream),
     batched ``segment_batch`` at a time;
  4. token streams concatenate (no overlap stitching needed: cuts sit in
     silence).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from lasr_tpu.decode.beam import BeamHypotheses

_SUB = 4  # Conv2dSubsampling stride (reference subsampling.py:14-74)


def _enc_len(n_in: int) -> int:
    """Encoder frames for ``n_in`` input frames under the exact
    ``[:, :-2:2][:, :-2:2]`` subsampling contract."""
    return ((n_in - 1) // 2 - 1) // 2


def pick_cut_frames(blank_lp: np.ndarray, n_frames: int, segment: int,
                    window: int) -> List[int]:
    """Cut points (frame indices) near multiples of ``segment``, each at
    the max-blank-log-prob frame within ±``window``."""
    cuts = []
    pos = segment
    while pos < n_frames:
        lo = max(pos - window, (cuts[-1] + 1) if cuts else 1)
        hi = min(pos + window, n_frames - 1)
        if lo >= hi:
            break
        w = blank_lp[lo:hi]
        cuts.append(lo + int(np.argmax(w)))
        pos = cuts[-1] + segment
    return cuts


class LongFormCTCAttDecoder:
    """Wraps a ``CTCAttBeamDecoder`` for unbounded-length audio.

    ``segment_frames``: encoder frames per segment bucket (768 ≈ 30 s of
    audio at the 4x subsampled 25 Hz frame rate).
    ``window_frames``: search radius for a silence cut around each nominal
    boundary.
    """

    def __init__(self, decoder, segment_frames: int = 768,
                 window_frames: int = 125, segment_batch: int = 4,
                 encoder_window_frames: int = 0,
                 encoder_halo_frames: int = 128,
                 encoder_window_batch: int = 4):
        """``encoder_window_frames``: encoder-frame width of one windowed
        forward's kept center (0 = default 2x ``segment_frames``); inputs
        longer than one window + halos encode windowed, shorter ones take
        the plain full forward.  ``encoder_halo_frames``: attention
        context kept on each side of a window (128 enc frames ~ 5 s)."""
        if encoder_halo_frames < 1:
            # halo 0 makes each window yield one fewer center frame than
            # claimed (the stride-4 conv margin needs >=1 halo frame),
            # which would trip the stitching assert mid-decode — reject
            # at construction instead
            raise ValueError("encoder_halo_frames must be >= 1 "
                             f"(got {encoder_halo_frames})")
        self.dec = decoder
        self.segment_frames = segment_frames
        self.window_frames = window_frames
        self.segment_batch = segment_batch
        self.encoder_window_frames = (encoder_window_frames
                                      or 2 * segment_frames)
        self.encoder_halo_frames = encoder_halo_frames
        self.encoder_window_batch = encoder_window_batch

    def _encode_windowed(self, feats, feat_len):
        """Linear-compute encoder forward: fixed-shape halo windows.

        feats: (1, T_in, D).  Returns (hs (T_enc, D') np, T_enc, lpz
        (T_enc, V) np) — the same values ``dec._encode`` produces for the
        kept centers, with attention context truncated at +/- halo.
        """
        import jax
        import jax.numpy as jnp

        T_in = int(np.asarray(feat_len)[0])
        W = self.encoder_window_frames * _SUB       # center, input frames
        H = self.encoder_halo_frames * _SUB         # halo, input frames
        Lw = W + 2 * H + 2                          # +conv margin (RF 7)
        x = np.asarray(feats)[0, :T_in]

        starts = list(range(0, T_in, W))            # center starts
        WB = self.encoder_window_batch
        T_enc = _enc_len(T_in)
        D = x.shape[-1]
        hs_parts: List[np.ndarray] = [None] * len(starts)
        lpz_parts: List[np.ndarray] = [None] * len(starts)

        for g in range(0, len(starts), WB):
            group = starts[g: g + WB]
            win = np.zeros((WB, Lw, D), x.dtype)
            win_len = np.ones((WB,), np.int32)
            offs = []
            for i, a in enumerate(group):
                lo = max(0, a - H)
                hi = min(T_in, a + W + H + 2)
                win[i, : hi - lo] = x[lo:hi]
                win_len[i] = hi - lo
                offs.append(lo)
            # per-row absolute-PE offsets (encoder frames) so windows of
            # abs-pos models see their true global positions; no-op for
            # the rel-pos recipe models (translation-invariant PE)
            offs_arr = np.zeros((WB,), np.int32)
            offs_arr[: len(offs)] = np.asarray(offs, np.int32) // _SUB
            hs_w, hs_len_w, lpz_w = self.dec._encode(
                jnp.asarray(win), jnp.asarray(win_len),
                pos_offset=jnp.asarray(offs_arr))
            hs_w = np.asarray(hs_w)
            lpz_w = np.asarray(lpz_w)
            hs_len_w = np.asarray(hs_len_w)
            for i, a in enumerate(group):
                # kept center in window-local encoder frames; the window
                # start offs[i] is a multiple of SUB, so local frame j is
                # global frame offs[i]/SUB + j exactly (stride-4
                # translation equivariance of the conv stack)
                j0 = (a - offs[i]) // _SUB
                j1 = min(j0 + self.encoder_window_frames,
                         int(hs_len_w[i]), T_enc - a // _SUB + j0)
                hs_parts[g + i] = hs_w[i, j0:j1]
                lpz_parts[g + i] = lpz_w[i, j0:j1]

        hs = np.concatenate(hs_parts, axis=0)
        lpz = np.concatenate(lpz_parts, axis=0)
        # the last window sees the true tail, so lengths line up exactly
        assert hs.shape[0] == T_enc, (hs.shape, T_enc)
        return hs, T_enc, lpz

    def __call__(self, feats, feat_len) -> Tuple[List[int], List[List[int]]]:
        """feats: (1, T_in, D). Returns (token_ids, per-segment ids)."""
        import jax.numpy as jnp
        assert np.asarray(feats).shape[0] == 1, "long-form decodes one stream"
        T_in = int(np.asarray(feat_len)[0])
        win_in = (self.encoder_window_frames
                  + 2 * self.encoder_halo_frames) * _SUB
        if T_in > win_in:
            hs, T, lpz = self._encode_windowed(feats, feat_len)
        else:
            hs, hs_len, lpz = self.dec._encode(jnp.asarray(feats),
                                               jnp.asarray(feat_len))
            hs = np.asarray(hs[0])
            lpz = np.asarray(lpz[0])
            T = int(np.asarray(hs_len)[0])

        if T <= self.segment_frames:
            segs = [(0, T)]
        else:
            cuts = pick_cut_frames(lpz[:T, self.dec.blank], T,
                                   self.segment_frames, self.window_frames)
            bounds = [0] + cuts + [T]
            segs = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]

        S = self.segment_frames
        # segments longer than the bucket (no silence found) are hard-split
        flat: List[Tuple[int, int]] = []
        for a, b in segs:
            while b - a > S:
                flat.append((a, a + S))
                a += S
            flat.append((a, b))
        segs = flat

        D = hs.shape[-1]
        V = lpz.shape[-1]
        all_tokens: List[int] = []
        per_seg: List[List[int]] = []
        for g in range(0, len(segs), self.segment_batch):
            group = segs[g: g + self.segment_batch]
            B = self.segment_batch
            hs_pad = np.zeros((B, S, D), hs.dtype)
            lpz_pad = np.full((B, S, V), -np.log(V), np.float32)
            lens = np.ones((B,), np.int32)  # 1-frame dummies for pad rows
            for i, (a, b) in enumerate(group):
                hs_pad[i, : b - a] = hs[a:b]
                lpz_pad[i, : b - a] = lpz[a:b]
                lens[i] = b - a
            out = self.dec.search(jnp.asarray(hs_pad), jnp.asarray(lens),
                                  jnp.asarray(lpz_pad), max_len=S)
            hyp = BeamHypotheses(*(np.asarray(x) for x in out))
            for i in range(len(group)):
                ids = hyp.best_ids(i)
                per_seg.append(ids)
                all_tokens.extend(ids)
        return all_tokens, per_seg
