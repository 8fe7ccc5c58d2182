"""Datasets: Kaldi-scp loading, length-aware batching, bucketed padding.

Behavioral port of ``lasr/data/dataset.py`` with a TPU-first batch contract:

  - ``AudioDataSet``: rows of ``{id, wav, text}`` from parallel wav.scp/text
    (id-match checked, dataset.py:79-95); ``load_check_data`` probes every
    duration and pre-tokenizes every transcript (dataset.py:63-133).
  - ``BatchAudioDataSet``: shuffle → stable sort by ``wav_len*16000 +
    token_len`` → duration/token filters → group by count or total seconds
    (dataset.py:260-305).

TPU-first differences (documented; external behavior equivalent):
  - Batches carry RAW waveforms; the fbank/SpecAugment frontend runs
    on-device inside the jitted step (ops/fbank.py) instead of in 16
    dataloader worker processes.  ``audio_trans`` still comes from YAML and
    is compiled into the device frontend (lasr_tpu/data/frontend.py).
  - Shapes are BUCKETED: samples round up to 1 s multiples, token lengths to
    multiples of 8, and the batch dim pads up to ``batch_pad_multiple`` with
    zero-length dummy rows — so XLA sees a small closed set of shapes
    instead of recompiling per batch.  Losses mask dummy rows via
    ``hs_len == 0``.
"""

from __future__ import annotations

import logging
import random
import threading
import queue as queue_mod
import zlib
from math import ceil, gcd
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from lasr_tpu.data import reader, resample

SAMPLE_RATE = 16000

# sox speed-perturbation factors and their exact rational resample ratios
# (reference datatrans.py:29-40); lengths change by den/num... see
# resample.resample_ratio: n_out = ceil(n * num/den) after gcd reduction
SPEED_RATES = (1.0, 1.1, 0.9)
_SPEED_NUM_DEN = {0.9: (10, 9), 1.1: (10, 11), 1.0: (1, 1)}


def _resample_out_len(n: int, num: int, den: int) -> int:
    """Exact output length of resample.resample_{kaiser,ratio}."""
    if num == den:
        return n
    g = gcd(num, den)
    return ceil(n * (num // g) / (den // g))


def _perturb_ratio(seed: int, utt_id: str) -> float:
    """Deterministic per-(seed, utterance) speed factor: batch shapes must
    be computable by every host WITHOUT reading audio (multi-host SPMD
    shape agreement), and a resumed run must redraw the same factors."""
    h = zlib.crc32(f"{seed}:{utt_id}".encode())
    return SPEED_RATES[h % len(SPEED_RATES)]


def round_up(n: int, multiple: int) -> int:
    return ((max(n, 1) + multiple - 1) // multiple) * multiple


def pad_stack(arrays: Sequence[np.ndarray], pad_value, length: int,
              dtype) -> np.ndarray:
    out = np.full((len(arrays), length) + arrays[0].shape[1:], pad_value,
                  dtype=dtype)
    for i, a in enumerate(arrays):
        out[i, : len(a)] = a
    return out


def _quantize_i16(w: np.ndarray) -> np.ndarray:
    """float [-1,1) wave -> int16 on the readers' /32768 grid
    (reader.py:89).  PCM-sourced samples round-trip exactly."""
    if w.dtype == np.int16:
        return w
    return np.clip(np.rint(w * 32768.0), -32768, 32767).astype(np.int16)


def _dequantize_i16(w: np.ndarray) -> np.ndarray:
    if w.dtype == np.int16:
        return w.astype(np.float32) / np.float32(32768.0)
    return w


class AudioDataSet:
    """Kaldi-scp dataset; one __getitem__ row = one utterance dict."""

    PAD_ID = 4  # BaseTokenizer.ID_VALUE_PAD

    def __init__(self, wav_list=None, text_list=None, feats_list=None,
                 tokenizer=None, audio_trans=("fbank:80",), feats_trans=None,
                 pad_audio=0, pad_feats=0,
                 sample_bucket: int = SAMPLE_RATE,
                 token_bucket: int = 8,
                 batch_pad_multiple: int = 1,
                 cache_audio_mb: int = 0,
                 wire_dtype: str = "float32",
                 device_audio_cache: bool = False):
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(
                f"wire_dtype must be 'float32' or 'int16', got {wire_dtype!r}")
        if device_audio_cache and audio_trans \
                and "soxspeed" in list(audio_trans):
            raise ValueError(
                "device_audio_cache requires epoch-invariant waveforms; "
                "soxspeed redraws the speed ratio per epoch — disable one")
        if device_audio_cache and pad_audio:
            raise ValueError(
                "device_audio_cache requires pad_audio=0 (the pool's "
                "sentinel row is zeros)")
        if isinstance(wav_list, str):
            wav_list = [wav_list]
        if isinstance(text_list, str):
            text_list = [text_list]
        self.wav_list = wav_list or []
        self.text_list = text_list or []
        self.feats_list = feats_list
        self.tokenizer = tokenizer
        self.audio_trans = list(audio_trans) if audio_trans else []
        self.feats_trans = feats_trans
        self.pad_audio = pad_audio
        self.pad_feats = pad_feats
        self.sample_bucket = sample_bucket
        self.token_bucket = token_bucket
        self.batch_pad_multiple = batch_pad_multiple
        # decoded-audio RAM cache (MB budget; 0 = off): epochs re-read the
        # same files, and on hosts where decode bandwidth is scarce the
        # codec work dominates the epoch (the reference hides this behind
        # num_workers=16 DataLoader processes, bin/train_lighting.py:232).
        # Cached entries are the post-resample 16 kHz float32 waves, BEFORE
        # soxspeed (whose per-epoch ratio is seed-dependent), so the cache
        # stays valid across epochs.  Insert-until-budget: the epoch's
        # access set is identical every pass, so eviction buys nothing.
        self.cache_audio_mb = cache_audio_mb
        # host->device wire format for the waveform batch.  'int16' ships
        # PCM at its SOURCE precision (readers decode int16 samples to
        # float/32768, reader.py:89) and the on-device frontend
        # dequantizes — halving H2D bytes per step AND the decoded-audio
        # cache's RAM (the raw waveform is the largest array in the batch;
        # on tunneled/bandwidth-scarce hosts the upload is the step wall).
        # Resampled/speed-perturbed waves re-quantize to the same grid
        # (error <= 1/65536, the source quantization floor).
        self.wire_dtype = wire_dtype
        # device-resident waveform pool (see trainer._DeviceAudioPool):
        # batches additionally carry 'wav_rows' (stable dataset row ids)
        # and 'wav_S' so the trainer can scatter epoch-1 uploads into an
        # HBM pool and gather later epochs' batches on device — zero
        # steady-state waveform H2D.  Requires epoch-invariant waves.
        self.device_audio_cache = device_audio_cache
        self._wav_cache: Dict[str, np.ndarray] = {}
        self._wav_cache_bytes = 0
        self.train_set: List = []

    def __len__(self) -> int:
        return len(self.train_set)

    def __getitem__(self, index):
        return self.train_set[index]

    def load_check_data(self) -> None:
        self.load_dataset()
        self.check_dataset()
        # stable row ids (post shuffle/sort/filter): the device audio
        # pool and deterministic resume key off these
        for i, it in enumerate(self.train_set):
            it["row"] = i

    def max_bucketed_samples(self) -> int:
        """Upper bound of any batch's padded S (device-pool row width)."""
        n = max((self.expected_samples(it) for it in self.train_set),
                default=1)
        return round_up(n, self.sample_bucket)

    def load_dataset(self) -> None:
        for wav_path, text_path in zip(self.wav_list, self.text_list):
            wav_rows = reader.read_scp(wav_path)
            text_rows = reader.read_scp(text_path)
            if len(wav_rows) != len(text_rows):
                raise RuntimeError(
                    f"row count mismatch: {wav_path} has {len(wav_rows)}, "
                    f"{text_path} has {len(text_rows)}")
            for (wid, wpath), (tid, text) in zip(wav_rows, text_rows):
                if wid != tid:
                    raise RuntimeError(
                        f"input data id doesn't match {wid},{tid}")
                self.train_set.append({
                    "id": wid, "wav": wpath, "text": text.upper(),
                    "feats": "None"})

    def check_dataset(self) -> None:
        logging.info("Checking data (%d utts)", len(self.train_set))
        for item in self.train_set:
            if item["wav"] != "None":
                frames, rate = reader.get_audio_frames(item["wav"])
                item["wav_len"] = frames / rate
                # exact 16 kHz sample count after read-time resampling —
                # batch shapes must be predictable from metadata alone
                item["n_samples"] = _resample_out_len(frames, SAMPLE_RATE,
                                                      rate)
            else:
                item["wav_len"] = 0.0
                item["n_samples"] = 0
            if item["text"] != "None" and self.tokenizer is not None:
                item["token"], ids = self.tokenizer.encode(
                    item["text"], add_sos_eos=False)
                item["token_id"] = np.asarray(ids, dtype=np.int64)
                item["token_len"] = len(ids)
            else:
                item["token_id"] = np.asarray([0], dtype=np.int64)
                item["token_len"] = 0

    # ---- batch assembly ----

    def _read_waves(self, items: Sequence[Dict]):
        """Batch audio as 16 kHz waves, via the decoded-audio cache when
        enabled (see ``cache_audio_mb``).  Entries are float32, or int16
        under ``wire_dtype='int16'`` (half the cache RAM; ``merge_batch``
        handles both)."""
        paths = [it["wav"] for it in items]
        if not self.cache_audio_mb:
            return self._decode_waves(paths)
        missing = [p for p in paths if p not in self._wav_cache]
        decoded = {}
        if missing:
            decoded = dict(zip(missing, self._decode_waves(missing)))
            budget = self.cache_audio_mb * 2 ** 20
            for p, w in decoded.items():
                if self.wire_dtype == "int16":
                    w = decoded[p] = _quantize_i16(w)
                if self._wav_cache_bytes + w.nbytes <= budget:
                    # copy: the native loader hands out views into the
                    # whole (B, max_s) batch buffer — caching the view
                    # would pin the full buffer
                    self._wav_cache[p] = np.ascontiguousarray(w)
                    self._wav_cache_bytes += w.nbytes
        return [self._wav_cache[p] if p in self._wav_cache
                else decoded[p] for p in paths]

    def _decode_waves(self, paths: Sequence[str]):
        """Decode audio paths: native C++ thread-pool loader when
        available (all-WAV/FLAC batches), python reader otherwise."""
        if all(p.lower().endswith((".wav", ".flac")) for p in paths):
            try:
                from lasr_tpu.data import native_loader
                if native_loader.available():
                    infos = [native_loader.wav_info(p) for p in paths]
                    max_s = max(max(n for n, _, _ in infos), 1)
                    wav, lens, rates = native_loader.read_batch(paths, max_s)
                    out = []
                    for i in range(len(paths)):
                        w = wav[i, : lens[i]]
                        if rates[i] != SAMPLE_RATE:
                            w = resample.resample_kaiser(
                                w, int(rates[i]), SAMPLE_RATE
                            ).astype(np.float32)
                        out.append(w)
                    return out
            except Exception as e:  # pragma: no cover - fallback path
                logging.warning("native loader failed (%s); python fallback", e)
        out = []
        for p in paths:
            wav, sr = reader.read_audio(p)
            wav = reader.average_channels(wav)
            if sr != SAMPLE_RATE:
                wav = resample.resample_kaiser(wav, sr, SAMPLE_RATE)
            out.append(np.asarray(wav, dtype=np.float32))
        return out

    def expected_samples(self, item: Dict, perturb_seed: int = 0) -> int:
        """Exact decoded length (16 kHz samples, incl. soxspeed) from
        metadata — no audio read.  Used for cross-host shape agreement and
        is asserted against the real decode in ``merge_batch``."""
        n = item.get("n_samples", 0)
        if "soxspeed" in self.audio_trans:
            num, den = _SPEED_NUM_DEN[_perturb_ratio(perturb_seed,
                                                     item["id"])]
            n = _resample_out_len(n, num, den)
        return n

    def batch_shape(self, group: Sequence[int], perturb_seed: int = 0
                    ) -> Tuple[int, int, int]:
        """Padded (B, S, L) of ``merge_batch`` over these row indices."""
        items = [self.train_set[i] for i in group]
        S = round_up(max(self.expected_samples(it, perturb_seed)
                         for it in items), self.sample_bucket)
        L = round_up(max(it["token_len"] for it in items) or 1,
                     self.token_bucket)
        B = round_up(len(items), self.batch_pad_multiple)
        return B, S, L

    def merge_batch(self, items: Sequence[Dict], perturb_seed: int = 0,
                    pad_to: Optional[Tuple[int, int, int]] = None) -> Dict:
        """Read + host-transform waveforms and pad to bucketed shapes.

        ``pad_to``: optional (B, S, L) floor — under multi-host SPMD every
        host must run an identically-shaped jitted step, so each host pads
        to the max predicted shape across the hosts' concurrent batches.
        """
        waves = self._read_waves(items)
        if "soxspeed" in self.audio_trans:
            # speed perturbation (reference datatrans.py:29-40 via sox);
            # resampling the wave by 1/ratio is the same time-stretch
            waves = [self._speed_perturb(
                _dequantize_i16(w), _perturb_ratio(perturb_seed, it["id"]))
                for w, it in zip(waves, items)]
        wave_lens = [len(w) for w in waves]

        S = round_up(max(wave_lens), self.sample_bucket)
        L = round_up(max(it["token_len"] for it in items) or 1,
                     self.token_bucket)
        B = round_up(len(items), self.batch_pad_multiple)
        if pad_to is not None:
            if pad_to[1] < S or pad_to[0] < B or pad_to[2] < L:
                raise RuntimeError(
                    f"batch shape prediction too small: predicted {pad_to}, "
                    f"actual {(B, S, L)} — metadata/decoder disagree")
            B, S, L = pad_to

        if self.wire_dtype == "int16":
            pad_q = int(np.clip(round(float(self.pad_audio) * 32768.0),
                                -32768, 32767))
            wav_array = np.full((B, S), pad_q, dtype=np.int16)
            for i, w in enumerate(waves):
                wav_array[i, : len(w)] = \
                    w if w.dtype == np.int16 else _quantize_i16(w)
        else:
            wav_array = np.full((B, S), float(self.pad_audio),
                                dtype=np.float32)
            for i, w in enumerate(waves):
                wav_array[i, : len(w)] = _dequantize_i16(w)
        wav_len = np.zeros((B,), dtype=np.int32)
        wav_len[: len(items)] = wave_lens

        token_id = np.full((B, L), self.PAD_ID, dtype=np.int32)
        token_len = np.zeros((B,), dtype=np.int32)
        for i, it in enumerate(items):
            token_id[i, : it["token_len"]] = it["token_id"]
            token_len[i] = it["token_len"]

        out = {
            "id": [it["id"] for it in items],
            "wav": [it["wav"] for it in items],
            "text": [it["text"] for it in items],
            "wav_array": wav_array,
            "wav_len": wav_len,
            "token_id": token_id,
            "token_len": token_len,
            "n_utts": len(items),
        }
        if self.device_audio_cache:
            # pad rows point at the pool's zeros sentinel (= n dataset rows)
            rows = np.full((B,), len(self.train_set), dtype=np.int32)
            rows[: len(items)] = [it["row"] for it in items]
            out["wav_rows"] = rows
            out["wav_S"] = int(S)
        return out

    @staticmethod
    def _speed_perturb(wav: np.ndarray, ratio: float) -> np.ndarray:
        """Speed perturbation by windowed-sinc resampling at a fixed output
        rate (the sox `speed` effect the reference applies,
        datatrans.py:29-40): rate r stretches time by 1/r.  The factor is
        drawn deterministically per (seed, utterance) by the caller."""
        if ratio == 1.0:
            return wav
        num, den = _SPEED_NUM_DEN.get(ratio, (round(1000 / ratio), 1000))
        return resample.resample_ratio(wav, num, den).astype(np.float32)

    def batch_indices(self, shuffle: bool = False, seed: int = 0
                      ) -> List[List[int]]:
        """Plain dataset: one utterance per batch (decode-style iteration)."""
        idx = list(range(len(self.train_set)))
        if shuffle:
            random.Random(seed).shuffle(idx)
        return [[i] for i in idx]

    def batches(self, shuffle: bool = False, seed: int = 0,
                num_workers: int = 4, prefetch: int = 4,
                process_index: int = 0, process_count: int = 1,
                skip: int = 0) -> Iterator[Dict]:
        """Iterate host batches with threaded read-ahead.

        Multi-host data parallelism shards batch order round-robin by
        ``process_index`` (the jit data axis shards within a host's batch).
        Every host MUST execute the same number of jitted steps per epoch —
        a straggler host missing one collective deadlocks the others — so
        the global order is padded up to a multiple of ``process_count`` by
        cycling batches from the head before sharding.

        ``skip``: drop the first N of this host's batches without reading
        their audio — deterministic mid-epoch resume (the batch order is a
        pure function of ``seed``, so a restored run continues exactly
        where the killed one stopped).
        """
        order = self.batch_indices(shuffle=shuffle, seed=seed)
        n_real = len(order)
        if process_count > 1 and order and len(order) % process_count:
            pad = process_count - len(order) % process_count
            order = order + [order[i % len(order)] for i in range(pad)]
        # batches cycled in purely for SPMD step-count agreement are
        # tagged so consumers (validation) can skip double-counting them
        pad_flags = [i >= n_real for i in range(len(order))]
        # SPMD shape agreement: at global step s every host enters the same
        # jitted program, so the P concurrent batches order[s*P .. s*P+P-1]
        # must share one padded shape.  Every host sees the full order and
        # the shape is a pure function of metadata (expected_samples), so
        # the common shape is computed WITHOUT communication.
        pad_shapes = None
        if process_count > 1:
            pad_shapes = []
            for g in range(0, len(order), process_count):
                shapes = [self.batch_shape(grp, perturb_seed=seed)
                          for grp in order[g: g + process_count]]
                pad_shapes.append(tuple(np.max(shapes, axis=0).tolist()))
        order = order[process_index::process_count]
        pad_flags = pad_flags[process_index::process_count]
        if skip:
            order = order[skip:]
            pad_flags = pad_flags[skip:]
            if pad_shapes is not None:
                pad_shapes = pad_shapes[skip:]
        if not order:
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        stop = object()

        def worker(sub_order, out_q):
            for pos, group in sub_order:
                items = [self.train_set[i] for i in group]
                merged = self.merge_batch(
                    items, perturb_seed=seed,
                    pad_to=pad_shapes[pos] if pad_shapes else None)
                merged["order_pad"] = pad_flags[pos]
                out_q.put(merged)
            out_q.put(stop)

        n_workers = max(1, min(num_workers, len(order)))
        indexed = list(enumerate(order))
        qs = [queue_mod.Queue(maxsize=max(1, prefetch // n_workers))
              for _ in range(n_workers)]
        threads = []
        for w in range(n_workers):
            t = threading.Thread(
                target=worker, args=(indexed[w::n_workers], qs[w]),
                daemon=True)
            t.start()
            threads.append(t)
        # round-robin drain preserves global batch order
        done = [False] * n_workers
        pos = 0
        served = 0
        while served < len(order):
            w = pos % n_workers
            pos += 1
            if done[w]:
                continue
            item = qs[w].get()
            if item is stop:
                done[w] = True
                continue
            served += 1
            yield item
        for t in threads:
            t.join()


class BatchAudioDataSet(AudioDataSet):
    """Dataset-level dynamic batching (dataset.py:234-312)."""

    def __init__(self, wav_list=None, text_list=None, feats_list=None,
                 tokenizer=None, audio_trans=("fbank:80",), feats_trans=None,
                 pad_audio=0, pad_feats=0,
                 batch_sort=True, batch_size=32, batch_duration=320,
                 batch_bin=32 * 500 * 80, batch_type="size",
                 max_duration=30, min_duration=0.3, text_freq=0.08,
                 min_token=0, max_token=5000,
                 sample_bucket: int = SAMPLE_RATE, token_bucket: int = 8,
                 batch_pad_multiple: int = 1, shuffle_seed: int = 1,
                 cache_audio_mb: int = 0,
                 wire_dtype: str = "float32",
                 device_audio_cache: bool = False):
        super().__init__(wav_list, text_list, feats_list, tokenizer,
                         audio_trans, feats_trans, pad_audio, pad_feats,
                         sample_bucket, token_bucket, batch_pad_multiple,
                         cache_audio_mb, wire_dtype, device_audio_cache)
        self.batch_type = batch_type
        self.batch_size = batch_size
        self.batch_bin = batch_bin
        self.batch_duration = batch_duration
        self.max_duration = max_duration
        self.min_duration = min_duration
        self.text_freq = text_freq
        self.min_token = min_token
        self.max_token = max_token
        self.batch_sort = batch_sort
        self.shuffle_seed = shuffle_seed
        self._groups: List[List[int]] = []

    def check_dataset(self) -> None:
        super().check_dataset()
        rng = random.Random(self.shuffle_seed)
        rng.shuffle(self.train_set)  # decorrelate sources before stable sort
        if self.batch_sort:
            self.train_set.sort(
                key=lambda x: x["wav_len"] * SAMPLE_RATE + x["token_len"])
        before = len(self.train_set)
        self.train_set = [
            x for x in self.train_set
            if (self.min_duration <= x["wav_len"] <= self.max_duration
                and self.min_token <= x["token_len"] <= self.max_token
                and x["wav_len"] / (x["token_len"] + 0.1) > self.text_freq)]
        if before != len(self.train_set):
            logging.info("filtered %d → %d utterances", before,
                         len(self.train_set))
        if self.batch_type == "size":
            self._groups = [list(range(i, min(i + self.batch_size,
                                              len(self.train_set))))
                            for i in range(0, len(self.train_set),
                                           self.batch_size)]
        elif self.batch_type == "duration":
            self._groups = []
            cur: List[int] = []
            total = 0.0
            for i, item in enumerate(self.train_set):
                cur.append(i)
                total += item["wav_len"]
                if total >= self.batch_duration:
                    self._groups.append(cur)
                    cur, total = [], 0.0
            if cur:
                self._groups.append(cur)
        else:
            raise ValueError(f"unknown batch_type {self.batch_type}")

    def __len__(self) -> int:
        return len(self._groups)

    def __getitem__(self, index):
        return [self.train_set[i] for i in self._groups[index]]

    def batch_indices(self, shuffle: bool = False, seed: int = 0
                      ) -> List[List[int]]:
        groups = list(self._groups)
        if shuffle:
            random.Random(seed).shuffle(groups)
        return groups
