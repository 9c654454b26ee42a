"""Checkpoint-loading tests: reference weight names -> our pytrees."""

import numpy as np
import pytest
from safetensors.numpy import save_file

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.io.checkpoint import (
    _merge_weight_norm,
    load_lm_params,
    load_raw_checkpoint,
)
from tests.test_dual_ar import CFG


def make_lm_state_dict(cfg: DualARConfig, rng):
    d, f = cfg.dim, cfg.ffn_dim
    qkv = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim
    sd = {
        "embeddings.weight": rng.normal(size=(cfg.vocab_size, d)),
        "codebook_embeddings.weight": rng.normal(
            size=(cfg.codebook_size * cfg.num_codebooks, d)
        ),
        "fast_embeddings.weight": rng.normal(size=(cfg.codebook_size, d)),
        "norm.weight": rng.normal(size=(d,)),
        "fast_norm.weight": rng.normal(size=(d,)),
        "output.weight": rng.normal(size=(cfg.vocab_size, d)),
        "fast_output.weight": rng.normal(size=(cfg.codebook_size, d)),
    }
    for prefix, n in [("layers", cfg.n_layer), ("fast_layers", cfg.n_fast_layer)]:
        for i in range(n):
            sd[f"{prefix}.{i}.attention.wqkv.weight"] = rng.normal(size=(qkv, d))
            sd[f"{prefix}.{i}.attention.wo.weight"] = rng.normal(size=(d, d))
            sd[f"{prefix}.{i}.feed_forward.w1.weight"] = rng.normal(size=(f, d))
            sd[f"{prefix}.{i}.feed_forward.w3.weight"] = rng.normal(size=(f, d))
            sd[f"{prefix}.{i}.feed_forward.w2.weight"] = rng.normal(size=(d, f))
            sd[f"{prefix}.{i}.attention_norm.weight"] = rng.normal(size=(d,))
            sd[f"{prefix}.{i}.ffn_norm.weight"] = rng.normal(size=(d,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


class TestLMLoading:
    def test_safetensors_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        sd = make_lm_state_dict(CFG, rng)
        path = tmp_path / "model.safetensors"
        save_file(sd, str(path))
        params = load_lm_params(tmp_path, CFG, dtype=np.float32)

        # linear weights transposed to (in, out) and stacked
        assert params["slow"]["wqkv"].shape == (
            CFG.n_layer, CFG.dim, (CFG.n_head + 2 * CFG.n_local_heads) * CFG.head_dim
        )
        np.testing.assert_allclose(
            np.asarray(params["slow"]["wqkv"][1]),
            sd["layers.1.attention.wqkv.weight"].T,
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(params["output"]), sd["output.weight"].T, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(params["embeddings"]), sd["embeddings.weight"], rtol=1e-6
        )

    def test_tied_embeddings(self, tmp_path):
        rng = np.random.default_rng(1)
        sd = make_lm_state_dict(CFG, rng)
        del sd["output.weight"]
        save_file(sd, str(tmp_path / "model.safetensors"))
        cfg = DualARConfig(**{**CFG.__dict__, "tie_word_embeddings": True})
        params = load_lm_params(tmp_path, cfg, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(params["output"]), sd["embeddings.weight"].T, rtol=1e-6
        )

    def test_missing_weight_raises(self, tmp_path):
        sd = make_lm_state_dict(CFG, np.random.default_rng(2))
        del sd["norm.weight"]
        save_file(sd, str(tmp_path / "model.safetensors"))
        with pytest.raises(KeyError, match="norm.weight"):
            load_lm_params(tmp_path, CFG, dtype=np.float32)

    def test_loaded_params_run(self, tmp_path):
        import jax.numpy as jnp

        from fish_speech_tpu.models.dual_ar import KVCache, slow_prefill
        from tests.test_dual_ar import TOK, random_tokens

        sd = make_lm_state_dict(CFG, np.random.default_rng(3))
        save_file(sd, str(tmp_path / "model.safetensors"))
        params = load_lm_params(tmp_path, CFG, dtype=jnp.float32)
        cache = KVCache.init(CFG.n_layer, 1, CFG.n_local_heads, 32, CFG.head_dim, jnp.float32)
        logits, hidden, _ = slow_prefill(
            params, CFG, TOK, random_tokens(0, 1, 5), jnp.asarray([5]), cache, 0, 0
        )
        assert logits.shape == (1, CFG.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()


class TestBF16Safetensors:
    """Fish 1.5's flagship model.safetensors is bf16; it must load with
    base deps only (reference mmaps it natively, load.rs:93-98)."""

    def _save_bf16(self, sd, path):
        import torch
        from safetensors.torch import save_file as save_torch

        save_torch(
            {k: torch.from_numpy(v).to(torch.bfloat16) for k, v in sd.items()},
            str(path),
        )

    def test_bf16_loads_without_torch(self, tmp_path, monkeypatch):
        import jax.numpy as jnp
        import ml_dtypes

        sd = make_lm_state_dict(CFG, np.random.default_rng(4))
        self._save_bf16(sd, tmp_path / "model.safetensors")

        # Block `import torch` for the duration of the load: a None entry
        # in sys.modules makes the import raise ImportError.
        import sys

        monkeypatch.setitem(sys.modules, "torch", None)
        raw = load_raw_checkpoint(tmp_path / "model.safetensors")
        assert raw["embeddings.weight"].dtype == ml_dtypes.bfloat16
        params = load_lm_params(tmp_path, CFG, dtype=jnp.bfloat16)
        assert params["embeddings"].dtype == jnp.bfloat16
        # values survive the f32 -> bf16 -> load chain (bf16 rounding only)
        np.testing.assert_allclose(
            np.asarray(params["embeddings"], np.float32),
            sd["embeddings.weight"],
            rtol=1e-2,
            atol=1e-2,
        )
        np.testing.assert_allclose(
            np.asarray(params["slow"]["wqkv"][0], np.float32),
            sd["layers.0.attention.wqkv.weight"].T,
            rtol=1e-2,
            atol=1e-2,
        )

    def test_f32_values_exact(self, tmp_path):
        """The mmap reader must be byte-exact for f32 files."""
        sd = make_lm_state_dict(CFG, np.random.default_rng(5))
        save_file(sd, str(tmp_path / "model.safetensors"))
        raw = load_raw_checkpoint(tmp_path / "model.safetensors")
        for k, v in sd.items():
            np.testing.assert_array_equal(raw[k], v)


class TestWeightNorm:
    def test_merge_matches_torch(self):
        import torch

        conv = torch.nn.Conv1d(4, 8, 3)
        wn = torch.nn.utils.parametrizations.weight_norm(conv)
        raw = {
            "c.parametrizations.weight.original0": wn.parametrizations.weight.original0.detach().numpy(),
            "c.parametrizations.weight.original1": wn.parametrizations.weight.original1.detach().numpy(),
            "c.bias": wn.bias.detach().numpy(),
        }
        merged = _merge_weight_norm(raw)
        np.testing.assert_allclose(
            merged["c.weight"], wn.weight.detach().numpy(), rtol=1e-5, atol=1e-6
        )
        assert "c.bias" in merged

    def test_pth_loading(self, tmp_path):
        import torch

        sd = {"a.weight": torch.randn(3, 4), "b.bias": torch.randn(3)}
        torch.save(sd, tmp_path / "model.pth")
        raw = load_raw_checkpoint(tmp_path / "model.pth")
        np.testing.assert_allclose(raw["a.weight"], sd["a.weight"].numpy())


class TestTorchFreePth:
    """Zip-format .pth (Fish 1.2's LM/codec format) must load without
    torch at runtime — the reference parses .pth natively through candle
    (load.rs:96-98); io/checkpoint.py does the same with zipfile + a
    restricted unpickler."""

    def _sd(self):
        import torch

        base = torch.randn(6, 4)
        return {
            "w.f32": torch.randn(3, 4),
            "w.f16": torch.randn(2, 5).half(),
            "w.bf16": torch.randn(4, 4).to(torch.bfloat16),
            "w.f64": torch.randn(2, 2, dtype=torch.float64),
            "w.i64": torch.arange(6),
            "w.noncontig": base.t(),  # transposed view: stride exercise
            "w.slice": base[1:5:2],  # offset + strided rows
            "w.scalar": torch.tensor(3.5),
        }

    def test_matches_torch_load_without_torch(self, tmp_path, monkeypatch):
        import sys

        import torch

        sd = self._sd()
        expected = {
            k: (v.float().numpy() if v.is_floating_point() else v.numpy())
            for k, v in sd.items()
        }
        torch.save(sd, tmp_path / "model.pth")

        monkeypatch.setitem(sys.modules, "torch", None)  # block import torch
        raw = load_raw_checkpoint(tmp_path / "model.pth")
        assert set(raw) == set(expected)
        for k in expected:
            np.testing.assert_array_equal(raw[k], expected[k], err_msg=k)

    def test_nested_state_dict_unwrapped(self, tmp_path, monkeypatch):
        import sys

        import torch

        inner = {"x.weight": torch.randn(2, 3)}
        torch.save({"state_dict": inner, "epoch": torch.tensor(7)},
                   tmp_path / "ckpt.pth")
        monkeypatch.setitem(sys.modules, "torch", None)
        raw = load_raw_checkpoint(tmp_path / "ckpt.pth")
        np.testing.assert_allclose(raw["x.weight"], inner["x.weight"].numpy())

    def test_weight_norm_pth_merges_without_torch(self, tmp_path, monkeypatch):
        """The Fish 1.2 vocoder .pth path: weight-norm parametrizations in
        a zip .pth fold into plain weights, torch-free."""
        import sys

        import torch

        conv = torch.nn.utils.parametrizations.weight_norm(
            torch.nn.Conv1d(4, 8, 3)
        )
        torch.save(conv.state_dict(), tmp_path / "gen.pth")
        expected = conv.weight.detach().numpy()
        monkeypatch.setitem(sys.modules, "torch", None)
        raw = load_raw_checkpoint(tmp_path / "gen.pth")
        np.testing.assert_allclose(raw["weight"], expected, rtol=1e-5, atol=1e-6)

    def test_refuses_arbitrary_objects(self, tmp_path):
        """weights_only stance: unpickling anything outside the tensor
        vocabulary must raise, not execute."""
        import pickle
        import zipfile

        with zipfile.ZipFile(tmp_path / "evil.pth", "w") as zf:
            zf.writestr(
                "archive/data.pkl", pickle.dumps({"cmd": object()})
            )
        with pytest.raises(Exception):
            load_raw_checkpoint(tmp_path / "evil.pth")
