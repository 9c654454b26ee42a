"""text + speaker prompt -> semantic tokens .npy.

Counterpart of reference: fish_speech_core/src/bin/llama_generate.rs.
Defaults match the reference CLI (temp 0.7, top-p 0.7, top-k 256,
rep-pen 1.2, max 1024; llama_generate.rs:107-156).

Usage:
  python -m fish_speech_tpu.cli.llama_generate \
      --checkpoint checkpoints/fish-speech-1.5 --fish-version 1.5 \
      --text "Hello world" --prompt-tokens voice.npy --prompt-text "..." \
      --out-path out.npy
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import (
    DualARConfig,
    TokenConfig,
    WhichLM,
    WhichModel,
)
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.io.checkpoint import load_lm_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.pipeline import FISH_1_5_SYSPROMPT
from fish_speech_tpu.text.clean import preprocess_text
from fish_speech_tpu.text.prompt import PromptEncoder, load_prompt_tokens


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="text -> semantic tokens (.npy)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--fish-version", default="1.5", choices=["1.2", "1.4", "1.5", "dual_ar"]
    )
    p.add_argument("--text", required=True)
    p.add_argument("--prompt-tokens", action="append", default=[],
                   help=".npy speaker codec tokens (repeatable)")
    p.add_argument("--prompt-text", action="append", default=[],
                   help="transcript for each --prompt-tokens")
    p.add_argument("--out-path", default="out.npy")
    p.add_argument("--temp", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=256)
    p.add_argument("--repetition-penalty", type=float, default=1.2)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--seed", type=int, default=None)
    return p


def main() -> None:
    args = build_parser().parse_args()
    model = WhichModel(args.fish_version)
    lm = WhichLM.from_model(model)

    from pathlib import Path

    from tokenizers import Tokenizer

    ckpt = Path(args.checkpoint)
    cfg_path = ckpt / "config.json"
    cfg = (
        DualARConfig.from_json(cfg_path)
        if cfg_path.exists()
        else DualARConfig.fish_speech_1_2()
    )
    tokenizer = Tokenizer.from_file(str(ckpt / "tokenizer.json"))
    token_cfg = TokenConfig.from_tokenizer(lm, tokenizer, cfg)

    t0 = time.perf_counter()
    params = load_lm_params(ckpt, cfg, dtype=jnp.bfloat16)
    engine = LMEngine(params, cfg, token_cfg, lm, dtype=jnp.bfloat16)
    print(f"Model loaded in {time.perf_counter() - t0:.1f}s")

    encoder = PromptEncoder(tokenizer, cfg.num_codebooks, lm)
    if len(args.prompt_tokens) != len(args.prompt_text):
        raise SystemExit("--prompt-tokens and --prompt-text must pair up")

    conditioning_parts = [
        encoder.encode_conditioning_prompt(
            text, load_prompt_tokens(path, cfg.num_codebooks)
        )
        for path, text in zip(args.prompt_tokens, args.prompt_text)
    ]
    # 1.5 prepends the hardcoded sysprompt (llama_generate.rs:52-66)
    if lm == WhichLM.FISH_1_5:
        conditioning_parts.insert(
            0, encoder.encode_text("system", FISH_1_5_SYSPROMPT)
        )
    speaker = (
        np.concatenate(conditioning_parts, axis=1) if conditioning_parts else None
    )

    chunks = preprocess_text(args.text)
    n_cond, encoded = encoder.encode_sequence(
        chunks, None, speaker, assume_kv_cache=True
    )

    sampling = SamplingArgs(
        temp=args.temp,
        top_p=args.top_p,
        top_k=args.top_k,
        repetition_penalty=args.repetition_penalty,
    )

    state = engine.init_state(args.seed)
    all_codes = []
    cond_len = 0
    # per-version frame rate for the RTF print: ~43.07 Hz for 1.2,
    # 21.533 for 1.4/1.5, 12.5 for DualAR/Mimi. (The reference prints
    # 21.535 even for 1.2 — single_batch.rs:292-295 — inflating its 1.2
    # RTF 2x; corrected here.)
    if lm == WhichLM.DUAL_AR:
        frame_rate = 12.5
    else:
        from fish_speech_tpu.config import FireflyConfig

        frame_rate = FireflyConfig.for_version(model.fish_version).frame_rate
    for i, chunk_tokens in enumerate(encoded):
        offset = cond_len if i > 0 else 0
        result, state = engine.generate(
            chunk_tokens,
            max_new_tokens=args.max_new_tokens,
            sampling=sampling,
            state=state,
            conditioning_offset=offset,
            # sync after prefill so the printed prefill/decode split is
            # real phase time (reference prints it per run,
            # single_batch.rs:238-247); serving paths skip the sync
            profile=True,
        )
        if i == 0:
            cond_len = n_cond
        state = engine.rewind(state, cond_len)
        codes = result.tokens
        if not lm.uses_explicit_semantic_ids:
            codes = np.maximum(codes.astype(np.int64) - 1, 0)
        all_codes.append(codes)
        print(
            f"chunk {i}: {result.frames} frames, prefill "
            f"{result.prefill_s * 1e3:.1f}ms, decode {result.decode_s:.2f}s "
            f"({result.frames / max(result.decode_s, 1e-9):.1f} tokens/s, "
            f"RTF {(result.frames / frame_rate) / max(result.decode_s, 1e-9):.3f})"
        )

    out = np.concatenate(all_codes, axis=1).astype(np.uint32)
    np.save(args.out_path, out)
    print(f"Wrote {out.shape} tokens to {args.out_path}")


if __name__ == "__main__":
    main()
