"""Utility-layer tests: config (YAML + dotlist), C() schedules, tokenizer,
prompts, saving, metrics, dataset helpers."""

import os

import numpy as np
import pytest

from dge_tpu.utils import config as C
from dge_tpu.utils import misc as M
from dge_tpu.utils import saving as S


class TestConfig:
    def test_dotlist_overrides(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nsystem:\n  lr: 0.5\n  name: x\n")
        cfg = C.load_config(str(p), ["system.lr=0.25", "b.c=hello", "a=7"])
        assert cfg["a"] == 7
        assert cfg["system"]["lr"] == 0.25
        assert cfg["b"]["c"] == "hello"

    def test_parse_structured_rejects_unknown(self):
        import dataclasses

        @dataclasses.dataclass
        class X:
            a: int = 1

        assert C.parse_structured(X, {"a": 2}).a == 2
        with pytest.raises(ValueError):
            C.parse_structured(X, {"zzz": 1})

    def test_trial_dir_layout(self, tmp_path):
        d = C.make_trial_dir(str(tmp_path), "exp", "tag", timestamp="T0")
        assert d.endswith(os.path.join("exp", "tag@T0"))
        assert os.path.isdir(d)


class TestC:
    def test_scalar_passthrough(self):
        assert M.C(0.5, 100) == 0.5

    def test_linear_schedule(self):
        # [start_step, start_value, end_value, end_step]
        spec = [0, 999.0, 21.0, 100]
        assert M.C(spec, 0) == 999.0
        assert M.C(spec, 100) == 21.0
        assert M.C(spec, 50) == (999.0 + 21.0) / 2

    def test_mask_morphology(self):
        m = np.zeros((9, 9), np.float32)
        m[4, 4] = 1
        d = M.dilate_mask(m, 1)
        assert d.sum() == 9
        assert M.erode_mask(d, 1).sum() == 1
        ring = np.zeros((9, 9), np.float32)
        ring[2:7, 2:7] = 1
        ring[3:6, 3:6] = 0
        assert M.fill_closed_areas(ring).sum() == 25


class TestTokenizer:
    def test_hash_tokenizer_shapes(self):
        from dge_tpu.diffusion.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=1000, max_length=16)
        ids = tok(["hello world", "a"])
        assert ids.shape == (2, 16)
        assert (tok("hello world") == ids[0]).all()  # deterministic

    def test_clip_bpe_when_vocab_present(self, tmp_path):
        import json

        from dge_tpu.diffusion.tokenizer import CLIPTokenizer, bytes_to_unicode

        # minimal vocab covering 'ab' with one merge
        b2u = bytes_to_unicode()
        a, b = b2u[ord("a")], b2u[ord("b")]
        vocab = {
            "<|startoftext|>": 0,
            "<|endoftext|>": 1,
            a: 2,
            b: 3,
            b + "</w>": 4,
            a + b + "</w>": 5,
        }
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(f"#version\n{a} {b}</w>\n")
        tok = CLIPTokenizer(
            str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
            max_length=8,
        )
        ids = tok("ab")
        assert ids.shape == (1, 8)
        assert list(ids[0][:3]) == [0, 5, 1]  # bos, merged 'ab</w>', eos


class TestPrompts:
    def test_cache_and_views(self, tmp_path):
        from dge_tpu.systems.prompts import PromptConfig, PromptProcessor

        calls = []

        def fake_encode(ids):
            calls.append(1)
            return np.ones((ids.shape[0], ids.shape[1], 4)) * len(calls)

        from dge_tpu.diffusion.tokenizer import HashTokenizer

        pp = PromptProcessor(
            HashTokenizer(max_length=8),
            fake_encode,
            cache_dir=str(tmp_path),
            cfg=PromptConfig(prompt="a cat", negative_prompt=""),
        )
        out1 = pp()
        n_calls = len(calls)
        out2 = pp()  # cached — no new encode calls
        assert len(calls) == n_calls
        assert np.allclose(out1.cond, out2.cond)

    def test_view_classification(self):
        from dge_tpu.systems.prompts import PromptConfig, classify_view

        cfg = PromptConfig()
        assert classify_view(0, 0, cfg) == "front"
        assert classify_view(179, 0, cfg) == "back"
        assert classify_view(90, 0, cfg) == "side"
        assert classify_view(0, 80, cfg) == "overhead"


class TestSavingMetrics:
    def test_image_roundtrip(self, tmp_path, rng):
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        p = S.save_image(str(tmp_path / "x.png"), img)
        back = S.load_image(p)
        assert back.shape == (16, 16, 3)
        assert np.abs(back - img).max() < 2 / 255

    def test_metrics_dirs(self, tmp_path, rng):
        from dge_tpu.ops import metrics as MT

        a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        os.makedirs(tmp_path / "r")
        os.makedirs(tmp_path / "g")
        S.save_image(str(tmp_path / "r" / "0.png"), a)
        S.save_image(str(tmp_path / "g" / "0.png"), a)
        out = MT.evaluate_pair_dirs(str(tmp_path / "r"), str(tmp_path / "g"))
        assert out["psnr"] > 45
        assert out["ssim"] > 0.99

    def test_grid_and_video(self, tmp_path, rng):
        imgs = [rng.uniform(size=(8, 8, 3)).astype(np.float32) for _ in range(5)]
        S.save_image_grid(str(tmp_path / "g.png"), imgs, cols=3)
        assert os.path.exists(tmp_path / "g.png")
        out = S.save_video(str(tmp_path / "v.mp4"), imgs, fps=5)
        assert os.path.exists(out)


class TestDataset:
    def test_subsample_and_ring(self):
        import math

        from dge_tpu.scene import look_at_camera
        from dge_tpu.scene.dataset import sort_cameras_ring, subsample_views

        cams = []
        for i in range(30):
            ang = 2 * math.pi * i / 30
            cams.append(
                look_at_camera(
                    np.array([3 * math.sin(ang), 0.2, -3 * math.cos(ang)]),
                    np.zeros(3),
                )
            )
        sub = subsample_views(cams, 10)
        assert len(sub) == 10
        order = sort_cameras_ring(cams)
        # ring order visits neighbors: successive angular indices differ by 1
        diffs = np.diff(order + [order[0]]) % 30
        assert (np.abs(np.minimum(diffs, 30 - diffs)) == 1).all()

    def test_colmap_roundtrip(self, tmp_path, rng):
        from dge_tpu.scene import colmap as CM

        cams = {
            1: CM.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 500.0, 320.0, 240.0]))
        }
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images = {
            1: CM.ColmapImage(1, q, rng.normal(size=3), 1, "img0.png"),
        }
        CM.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
        CM.write_images_binary(images, str(tmp_path / "images.bin"))
        c2, i2 = CM.load_sparse(str(tmp_path))
        assert c2[1].model == "PINHOLE"
        assert np.allclose(c2[1].params, cams[1].params)
        assert np.allclose(i2[1].qvec, q)
        assert i2[1].name == "img0.png"
