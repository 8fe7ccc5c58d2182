"""Long-form decoding: blank-aligned segmentation + per-segment joint
beam search.

The fixed-shape joint search (decode/beam.py) allocates hypothesis and
KV-cache state proportional to T_enc x max_len, which exhausts HBM for
utterances beyond ~60 s at the baseline-recipe scale
(tools/bench_longform.py).  The reference has no long-form story at all —
its python beam loop just gets slower (and its recipes filter audio at
max_duration=30 s, dataset.py:266-278).  This decoder makes hour-scale
audio tractable TPU-natively:

  1. one full-utterance encoder + CTC pass (linear memory);
  2. segment cut points chosen at the most blank-dominated frame inside a
     window around each nominal boundary — CTC blank posteriors are a
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
                 window_frames: int = 125, segment_batch: int = 4):
        self.dec = decoder
        self.segment_frames = segment_frames
        self.window_frames = window_frames
        self.segment_batch = segment_batch

    def __call__(self, feats, feat_len) -> Tuple[List[int], List[List[int]]]:
        """feats: (1, T_in, D). Returns (token_ids, per-segment ids)."""
        import jax.numpy as jnp
        assert np.asarray(feats).shape[0] == 1, "long-form decodes one stream"
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
