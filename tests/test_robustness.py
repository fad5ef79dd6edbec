"""Robustness tests for auxiliary paths."""

import json
import os

import numpy as np
import pytest

from vqa_project_tpu.data.loader import prefetch_to_device
from vqa_project_tpu.train.metrics import MetricLogger


def test_prefetch_propagates_worker_errors():
    """An exception inside the producer thread must surface to the
    consumer, not silently end the epoch."""
    def gen():
        yield 1
        raise RuntimeError("boom")

    out = []
    with pytest.raises(RuntimeError, match="boom"):
        for item in prefetch_to_device(gen(), lambda x: x * 2, depth=2):
            out.append(item)
    assert out == [2]


def test_prefetch_put_fn_errors_surface():
    with pytest.raises(ValueError, match="bad put"):
        def bad_put(x):
            raise ValueError("bad put")
        list(prefetch_to_device(iter([1, 2]), bad_put, depth=1))


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricLogger(log_interval=2, jsonl_path=path, n_chips=2,
                      batch_size=8)
    for step in range(4):
        lg.update(epoch=0, step=step, loss=0.5, score=4.0)
    lg.close()
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 2
    assert recs[0]["loss"] == pytest.approx(0.5)
    assert recs[0]["vqa_acc"] == pytest.approx(50.0)  # 4 of 8 per step
    assert "qa_pairs_per_sec_per_chip" in recs[0]


def test_load_images_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from vqa_project_tpu.data.yolo import LoadImages

    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                        (64, 48))
    ok = w.isOpened()
    for i in range(4):
        frame = np.full((48, 64, 3), i * 40, np.uint8)
        w.write(frame)
    w.release()
    if not ok or os.path.getsize(vid) < 100:
        pytest.skip("cv2 video writer unavailable in this build")

    frames = list(LoadImages(vid, img_size=64))
    assert len(frames) >= 3
    path, chw, raw, cap = frames[0]
    assert chw.shape[0] == 3
    assert cap is not None


def test_zarr_group_contains_and_missing_key(tmp_path, rng):
    from vqa_project_tpu.data import ZarrWriter, open_group

    w = ZarrWriter(str(tmp_path / "g.zarr"))
    w.create_dataset("7", rng.normal(size=(3, 4)).astype(np.float32))
    g = open_group(str(tmp_path / "g.zarr"))
    assert "7" in g and 7 in g  # int keys coerced like zarr-python
    assert "8" not in g
    with pytest.raises(KeyError):
        g["8"]


def test_batcher_rejects_indivisible_partitions(tmp_path):
    from vqa_project_tpu.data import Batcher, GraphVQADataset
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa

    d = str(tmp_path / "d")
    generate_synthetic_vqa(d, n_images=4, n_questions=12, n_obj=4,
                           feat_dim=8, q_vocab=6, n_answers=4)
    ds = GraphVQADataset.vqa2(d, "train", n_obj=4, max_qlen=10)
    parts = np.zeros(ds.n_questions, np.int32)
    with pytest.raises(ValueError, match="not divisible"):
        Batcher(ds, 10, partitions=parts, n_partitions=8)


def test_pack_unpack_index_batch_roundtrip(rng):
    import jax.numpy as jnp

    from vqa_project_tpu.data.loader import pack_index_batch
    from vqa_project_tpu.train.steps import unpack_index_batch

    b, t, s = 6, 11, 5
    batch = {
        "question": rng.integers(0, 50, (b, t)).astype(np.int32),
        "qlen": rng.integers(1, t + 1, (b,)).astype(np.int32),
        "image_row": rng.integers(0, 9, (b,)).astype(np.int32),
        "ans_idx": rng.integers(0, 20, (b, s)).astype(np.int32),
        "ans_score": rng.uniform(size=(b, s)).astype(np.float32),
        "vote_idx": rng.integers(0, 20, (b, s)).astype(np.int32),
        "vote_val": rng.uniform(size=(b, s)).astype(np.float32),
        "mask": (rng.uniform(size=(b,)) > 0.3).astype(np.float32),
        "qid": np.arange(b), "index": np.arange(b),
    }
    packed = pack_index_batch(batch)
    assert set(packed) == {"ints", "floats"}
    out = unpack_index_batch(
        {k: jnp.asarray(v) for k, v in packed.items()})
    for k in ("question", "qlen", "image_row", "ans_idx", "vote_idx"):
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
    for k in ("ans_score", "vote_val", "mask"):
        np.testing.assert_allclose(np.asarray(out[k]), batch[k])


def test_sizes_csv_roundtrip(tmp_path):
    from vqa_project_tpu.data.datasets import (
        _read_sizes_csv,
        write_sizes_csv,
    )

    sizes = {"img1": (320, 240), "img2.jpg": (640, 480)}
    p = str(tmp_path / "s.csv")
    write_sizes_csv(p, sizes)
    back = _read_sizes_csv(p)
    assert set(back) == set(sizes)
    np.testing.assert_array_equal(back["img1"], [320.0, 240.0])
    np.testing.assert_array_equal(back["img2.jpg"], [640.0, 480.0])


def test_enable_compilation_cache(tmp_path):
    import jax

    from vqa_project_tpu.utils import enable_compilation_cache

    d = str(tmp_path / "cache")
    got = enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_onchip_validation_not_stale():
    """The gated hardware tests' evidence must match the CURRENT kernel
    sources: tools/check_onchip_stale.py compares content hashes of
    ops/pallas/*.py (+ the gated test files) against the record written
    at the last on-chip pass. Editing a kernel without re-running
    `VQAX_TEST_TPU=1 pytest tests/test_dropout_onchip.py
    tests/test_kernels_onchip.py` turns this red (VERDICT r3 item 2)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "check_onchip_stale.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr


def test_make_mesh_rejects_overrequest():
    """Asking for more devices than exist must error, not silently
    truncate to a smaller (or single-chip) mesh the operator believes
    is sharding their batches."""
    import jax

    from vqa_project_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="device"):
        make_mesh(jax.device_count() + 1)
    assert make_mesh(jax.device_count()).devices.size == jax.device_count()


def test_entry_pallas_flag_spellings():
    """Truthy misspellings of VQAX_ENTRY_PALLAS must select the shipped
    Pallas default, never silently fall back to the unfused path the
    flag exists to cover."""
    from __graft_entry__ import _entry_pallas_mode

    assert _entry_pallas_mode("force") is True
    assert _entry_pallas_mode(" FORCE ") is True
    for s in (None, "", "0", "false", "OFF", "no"):
        assert _entry_pallas_mode(s) is False
    for s in ("1", "true", "True", "on", "yes", "auto", "2"):
        assert _entry_pallas_mode(s) == "auto"


def test_synthetic_fingerprint_regenerates(tmp_path):
    """Re-running a --synthetic CLI with different generation knobs on
    the same --data_dir regenerates the dataset instead of silently
    training the stale artifacts (the knobs ARE the dataset)."""
    from vqa_project_tpu.cli.run import _dataset, input_args

    base = ["--train", "--synthetic", "--data_dir", str(tmp_path),
            "--n_obj", "8", "--emb", "24"]
    def args(extra):
        return input_args(base + extra)[0]

    ds1 = _dataset(args(["--synthetic_answers", "12"]), "train")
    assert ds1.n_answers == 13  # 12 + pad slot
    # same knobs -> reuse (fingerprint matches, no regeneration)
    mtime = os.path.getmtime(os.path.join(tmp_path, "synthetic",
                                          "fingerprint.json"))
    _dataset(args(["--synthetic_answers", "12"]), "train")
    assert os.path.getmtime(os.path.join(tmp_path, "synthetic",
                                         "fingerprint.json")) == mtime
    # changed knob -> regenerated dataset reflects it
    ds2 = _dataset(args(["--synthetic_answers", "20"]), "train")
    assert ds2.n_answers == 21


def test_make_mesh_2d_rejects_overrequest():
    """The 2-D (tp) constructor must mirror make_mesh's over-request
    error: --num_devices 16 --tp 2 on an 8-device host previously
    truncated to a (4, 2) mesh with half the requested data
    parallelism and no warning."""
    import jax

    from vqa_project_tpu.parallel.tp import make_mesh_2d

    with pytest.raises(ValueError, match="device"):
        make_mesh_2d(tp=2, num_devices=jax.device_count() * 2)
    m = make_mesh_2d(tp=2, num_devices=jax.device_count())
    assert m.devices.size == jax.device_count()


def test_synthetic_rejects_too_few_answers():
    """2*n_classes > n_answers must raise an explanatory ValueError
    (survives python -O), not die later with a bare IndexError inside
    the row generator."""
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa

    import os
    target = "/tmp/vqax-test-synth-reject"
    with pytest.raises(ValueError, match="synthetic_answers"):
        generate_synthetic_vqa(target, n_images=2, n_questions=4,
                               n_answers=12, n_classes=7)
    # knob validation runs BEFORE any filesystem writes
    assert not os.path.exists(target)


def test_cli_help_strings_format():
    """Every CLI's --help must render: argparse interpolates help text
    with `% params`, so an unescaped `%` in a help string (e.g. the
    int8 table's "~0.4% input error") crashes help formatting — and
    with it the reference-parity bare `python run.py` -> print help
    path (reference run.py:569-570)."""
    import contextlib
    import io

    from vqa_project_tpu.cli import medical, plot, run, serve

    for parse in (run.input_args, medical.medical_input_args,
                  plot.input_args, serve.input_args):
        parser_help = io.StringIO()
        with contextlib.redirect_stdout(parser_help), \
                pytest.raises(SystemExit):
            parse(["--help"])
        assert "usage" in parser_help.getvalue()
