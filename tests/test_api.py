"""End-to-end test of the user-facing api.LM class against a synthetic
on-disk checkpoint (config.json + tokenizer.json + model.safetensors),
mirroring how the PyO3 bindings load (reference: fish_speech_python)."""

import dataclasses
import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from tests.test_checkpoint import make_lm_state_dict
from tests.test_dual_ar import CFG


def _write_tokenizer(path, cfg):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 0, "<|im_start|>": 1, "<|im_end|>": 4, "<|semantic|>": 5,
             "<|voice|>": 6}
    # semantic range right after the specials
    for i in range(cfg.codebook_size):
        vocab[f"<|semantic:{i}|>"] = 10 + i
    for w, wid in [("hello", 30), ("world", 31), ("speak", 32), ("out", 33),
                   ("the", 34), ("provided", 35), ("text", 36), (".", 37)]:
        vocab[w] = wid
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(path))


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    rng = np.random.default_rng(0)
    sd = make_lm_state_dict(CFG, rng)
    # strengthen the im_end head column so argmax generations terminate
    sd["output.weight"][4] *= 50.0
    save_file(sd, str(d / "model.safetensors"))
    cfg_json = {
        f.name: getattr(CFG, f.name) for f in dataclasses.fields(CFG)
    }
    (d / "config.json").write_text(json.dumps(cfg_json))
    _write_tokenizer(d / "tokenizer.json", CFG)
    return d


def test_api_lm_generates_codes(checkpoint_dir):
    from fish_speech_tpu.api import LM

    lm = LM(str(checkpoint_dir), version="1.5", device="cpu", dtype="f32")
    codes = lm(["hello world ."], temp=0.0, max_new_tokens=8)
    assert codes.dtype == np.uint32
    assert codes.ndim == 3 and codes.shape[0] == 1
    assert codes.shape[1] == CFG.num_codebooks
    assert 1 <= codes.shape[2] <= 8
    assert codes.max() < CFG.codebook_size


def test_api_lm_speaker_prompt(checkpoint_dir):
    from fish_speech_tpu.api import LM

    lm = LM(str(checkpoint_dir), version="1.5", device="cpu", dtype="f32")
    rng = np.random.default_rng(1)
    spk = lm.create_speaker_prompt(
        [{"text": "hello", "codes": rng.integers(
            0, CFG.codebook_size, size=(CFG.num_codebooks, 4), dtype=np.uint32
        )}]
    )
    assert spk.shape[:2] == (1, CFG.num_codebooks + 1)
    codes = lm(["world ."], speaker_prompt=spk, temp=0.0, max_new_tokens=6)
    assert codes.shape[1] == CFG.num_codebooks
