"""Native C++ WAV loader vs the pure-python reader."""

import numpy as np
import pytest

from lasr_tpu.data import native_loader, reader


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths, waves = [], []
    for i, n in enumerate((1000, 4321, 16000)):
        w = rng.uniform(-0.9, 0.9, n)
        p = str(root / f"w{i}.wav")
        reader.write_wav(p, w, 16000)
        paths.append(p)
        waves.append(w)
    # stereo file
    st = np.stack([rng.uniform(-0.5, 0.5, 500), rng.uniform(-0.5, 0.5, 500)], 1)
    p = str(root / "st.wav")
    reader.write_wav(p, st, 8000)
    return paths, waves, p, st


def test_native_available():
    assert native_loader.available(), "g++ build of native/wavio.cc failed"


def test_native_matches_python(wavs):
    paths, waves, _, _ = wavs
    for p, w in zip(paths, waves):
        got, sr = native_loader.read_wav_mono(p)
        assert sr == 16000 and len(got) == len(w)
        py, _ = reader.read_wav(p)
        np.testing.assert_allclose(got, py, atol=1e-6)


def test_native_info_and_stereo_average(wavs):
    _, _, p, st = wavs
    n, sr, ch = native_loader.wav_info(p)
    assert (n, sr, ch) == (500, 8000, 2)
    got, _ = native_loader.read_wav_mono(p)
    py = reader.average_channels(reader.read_wav(p)[0])
    np.testing.assert_allclose(got, py, atol=1e-6)


def test_native_batch(wavs):
    paths, waves, _, _ = wavs
    out, lens, rates = native_loader.read_batch(paths, 16000, n_threads=3)
    assert out.shape == (3, 16000)
    np.testing.assert_array_equal(lens, [1000, 4321, 16000])
    assert np.all(rates == 16000)
    for i, w in enumerate(waves):
        np.testing.assert_allclose(out[i, : lens[i]],
                                   reader.read_wav(paths[i])[0], atol=1e-6)
        assert np.all(out[i, lens[i]:] == 0.0)


def test_dataset_uses_native(wavs, tmp_path):
    paths, _, _, _ = wavs
    (tmp_path / "wav.scp").write_text(
        "\n".join(f"u{i} {p}" for i, p in enumerate(paths)) + "\n")
    (tmp_path / "text").write_text(
        "\n".join(f"u{i} GO" for i in range(len(paths))) + "\n")
    (tmp_path / "dict.txt").write_text("G\nO\n")
    from lasr_tpu.data.dataset import AudioDataSet
    from lasr_tpu.data.tokenizer import CharTokenizer
    ds = AudioDataSet(wav_list=str(tmp_path / "wav.scp"),
                      text_list=str(tmp_path / "text"),
                      tokenizer=CharTokenizer(str(tmp_path / "dict.txt")),
                      audio_trans=["fbank:80"])
    ds.load_check_data()
    batch = ds.merge_batch(ds.train_set)
    assert batch["wav_array"].shape[0] == 3
    assert batch["wav_len"][2] == 16000
