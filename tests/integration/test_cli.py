"""CLI surface smoke tests: train -> generate -> eval pipelines in-process."""

import os
import sys

import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "corpus.txt"
    p.write_text("the cat sat on the mat. " * 500)
    return str(p)


TINY = ["--seq-len", "64", "--kernel-len", "16", "--d-model", "32", "--n-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--steps-per-epoch", "6", "--log-every-steps", "0"]


def run_cli(module, argv):
    from importlib import import_module

    mod = import_module(module)
    mod.main(argv)


class TestTrainerCLIs:
    def test_train_lm_then_generate_then_eval(self, corpus, tmp_path):
        ckpt = str(tmp_path / "lm.msgpack")
        run_cli("scripts.train_lm", ["--data", corpus, "--ckpt-path", ckpt, "--no-val"] + TINY)
        assert os.path.exists(ckpt) and os.path.exists(ckpt + ".sha256")
        run_cli("scripts.generate_from_ckpt", ["--ckpt", ckpt, "--prompt", "the", "--max-new", "8"])
        run_cli("scripts.stream_generate_fast", ["--ckpt", ckpt, "--prompt", "the", "--max-new", "8"])
        run_cli("scripts.eval_ckpt", ["--ckpt", ckpt, "--data", corpus, "--max-new", "8"])

    def test_chunk_pipeline(self, corpus, tmp_path):
        ckpt = str(tmp_path / "chunk.msgpack")
        run_cli("scripts.train_chunk_head", ["--data", corpus, "--ckpt-path", ckpt, "--chunk", "8"] + TINY)
        run_cli("scripts.generate_chunked", ["--ckpt", ckpt, "--prompt", "the", "--chunks", "2"])
        run_cli("scripts.generate_chunk_simple", ["--ckpt", ckpt, "--prompt", "the", "--chunks", "2"])
        run_cli("scripts.generate_chunked_overlap_save", ["--ckpt", ckpt, "--prompt", "the", "--chunks", "2"])
        run_cli("scripts.generate_chunked_stateful", ["--ckpt", ckpt, "--prompt", "the", "--chunks", "2"])
        run_cli("scripts.eval_chunk_ckpt", ["--ckpt", ckpt, "--data", corpus, "--windows", "4", "--batch-size", "2"])

    def test_bicameral_dual_freqnative_trainer_clis(self, corpus, tmp_path):
        """The remaining trainer wrappers: phase-clock (bicameral), dual-head
        (hash-teacher fallback), frequency-native — each trains tiny, writes a
        ckpt, and round-trips through the arch-sniffing eval CLI."""
        for module, name in [
            ("scripts.train_bicameral", "pc"),
            ("scripts.train_dual_head", "dual"),
            ("scripts.train_frequency_native", "fn"),
        ]:
            ckpt = str(tmp_path / f"{name}.msgpack")
            run_cli(module, ["--data", corpus, "--ckpt-path", ckpt, "--chunk", "8"] + TINY)
            assert os.path.exists(ckpt) and os.path.exists(ckpt + ".sha256")
            run_cli("scripts.eval_chunk_ckpt",
                    ["--ckpt", ckpt, "--data", corpus, "--windows", "4", "--batch-size", "2"])

    def test_segmentation_head_trainer_cli(self, corpus, tmp_path):
        """The segmentation head has no reference CLI; ours is
        scripts.train_segmented over the shared loop."""
        ckpt = str(tmp_path / "seg.msgpack")
        run_cli("scripts.train_segmented", ["--data", corpus, "--ckpt-path", ckpt, "--chunk", "8"] + TINY)
        assert os.path.exists(ckpt) and os.path.exists(ckpt + ".sha256")
        run_cli("scripts.generate_chunk_simple", ["--ckpt", ckpt, "--prompt", "the", "--chunks", "2"])
