"""Coverage for train/data.py — corpus loading and window sampling.

Reference: fft_lm/train_fixed_full.py:115-147; chunk windows
fft_lm/chunk_head.py:72-79; Hann dataset fft_lm/bicameral.py:275-323.
"""

import numpy as np
import pytest

from spectral_tpu.train import data as D


class TestSanitize:
    def test_keeps_printable_and_newline(self):
        arr = np.array([10, 32, 65, 126], dtype=np.uint8)
        np.testing.assert_array_equal(D.sanitize_ascii(arr), arr)

    def test_replaces_rest_with_space(self):
        arr = np.array([0, 9, 13, 127, 200], dtype=np.uint8)
        np.testing.assert_array_equal(D.sanitize_ascii(arr), np.full(5, 32, np.uint8))

    def test_native_and_numpy_agree(self):
        arr = np.random.default_rng(0).integers(0, 256, size=4096).astype(np.uint8)
        expect = D.sanitize_ascii(arr)
        if D._native_corpus is not None:
            np.testing.assert_array_equal(D._native_corpus.sanitize_ascii(arr), expect)


class TestLoadCorpus:
    def test_roundtrip_and_sanitize(self, tmp_path):
        p = tmp_path / "c.txt"
        p.write_bytes(b"hello\x00world\n")
        got = D.load_corpus_as_u8(str(p), sanitize=True)
        assert bytes(got) == b"hello world\n"
        raw = D.load_corpus_as_u8(str(p), sanitize=False)
        assert bytes(raw) == b"hello\x00world\n"
        assert raw.flags.writeable  # .copy() — not a frombuffer view


class TestWindows:
    def test_gather_windows_values(self):
        corpus = np.arange(100, dtype=np.uint8)
        starts = np.array([0, 10, 50], dtype=np.int64)
        w = D.gather_windows(corpus, starts, 5)
        np.testing.assert_array_equal(w[1], np.arange(10, 15, dtype=np.uint8))
        assert w.shape == (3, 5)

    def test_sample_lm_batch_shift(self):
        corpus = np.arange(256, dtype=np.uint8)
        x, y = D.sample_lm_batch(corpus, 4, 16, np.random.default_rng(0))
        assert x.shape == (4, 16) and y.shape == (4, 16)
        np.testing.assert_array_equal(x[:, 1:], y[:, :-1])  # y is x shifted by one
        assert x.dtype == np.int32

    def test_val_starts_deterministic_and_bounded(self):
        s1 = D.make_val_starts(10_000, 128, 64, seed=3)
        s2 = D.make_val_starts(10_000, 128, 64, seed=3)
        np.testing.assert_array_equal(s1, s2)
        assert int(s1.max()) + 129 < 10_000

    def test_chunk_windows_are_contiguous(self):
        corpus = np.arange(0, 250, dtype=np.uint8)
        x, y = D.vectorized_windows(corpus, np.array([5]), seq_len=32, chunk=8)
        assert x.shape == (1, 32) and y.shape == (1, 8)
        assert int(y[0, 0]) == int(x[0, -1]) + 1  # chunk continues the window


class TestWindowedChunkDataset:
    def test_shapes_and_hann(self):
        corpus = np.random.default_rng(0).integers(0, 256, size=8192).astype(np.uint8)
        ds = D.WindowedChunkDataset(corpus, seq_len=128, chunk_size=64, overlap=16)
        x, y, w = ds.get_window(2)
        assert x.shape == (128,) and y.shape == (64,) and w.shape == (64,)
        assert w[0] == pytest.approx(0.0)  # Hann tapers the edges
        assert float(w.max()) <= 1.0
        xs, ys, ws = ds.sample_batch(4, np.random.default_rng(1))
        assert xs.shape == (4, 128) and ys.shape == (4, 64) and ws.shape == (4, 64)

    def test_stride_respects_overlap(self):
        corpus = np.zeros(8192, np.uint8)
        ds = D.WindowedChunkDataset(corpus, seq_len=128, chunk_size=64, overlap=16)
        assert ds.stride == 48
        assert ds.num_chunks == (8192 - 128 - 64) // 48


class TestBuildCodeCorpus:
    """scripts.build_code_corpus — the in-image larger-corpus builder."""

    def test_splits_are_disjoint_and_reproducible(self, tmp_path):
        import json
        import subprocess
        import sys

        src = tmp_path / "src"
        src.mkdir()
        for i in range(90):
            (src / f"mod_{i:03d}.py").write_text(
                f"# module {i}\n" + f"def f_{i}(x):\n    return x + {i}\n" * 12
            )
        out = tmp_path / "corpus"
        cmd = [
            sys.executable, "-m", "scripts.build_code_corpus",
            "--roots", str(src), "--out", str(out),
        ]
        subprocess.run(cmd, check=True, cwd="/root/repo")
        train = (out / "train.txt").read_text()
        valid = (out / "valid.txt").read_text()
        test = (out / "test.txt").read_text()
        assert train and valid and test
        manifest = json.loads((out / "MANIFEST.json").read_text())
        # file-level splits: no eval file's body appears in train
        for path, info in manifest["files"].items():
            body = open(path).read()
            if info["split"] != "train":
                assert body not in train
        # deterministic: a second run writes identical bytes
        subprocess.run(cmd, check=True, cwd="/root/repo")
        assert (out / "train.txt").read_text() == train
