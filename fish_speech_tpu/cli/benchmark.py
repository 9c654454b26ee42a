"""In-process serving benchmark harness.

Counterpart of the reference's benchmark binary
(reference: server/src/bin/benchmark.rs:10-116): loads the full server
pipeline and runs the same three scenarios with wall-clock reports —
one unbatched request, one batch_size=1 request, one batch_size=4
request — plus per-phase timing (prefill / decode / vocode) and RTF.

Usage:
    python -m fish_speech_tpu.cli.benchmark --checkpoint <dir> \
        --fish-version 1.5 [--voice-dir voices/] [--text "..."]

With --random-weights it runs on random-initialized weights at the
Fish-1.5 architecture (no checkpoint needed) — the compute path is
identical, which is what the wall-clock numbers measure.
"""

from __future__ import annotations

import argparse
import sys
import time


DEFAULT_TEXT = (
    "Beneath the golden rooftops of a quiet mountain town, the morning "
    "market slowly came to life as vendors arranged baskets of fruit and "
    "fresh bread."
)


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def _load_random_pipeline():
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.config import (
        DualARConfig,
        FireflyConfig,
        FishVersion,
        TokenConfig,
        WhichLM,
    )
    from fish_speech_tpu.generate.engine import LMEngine
    from fish_speech_tpu.models.codec.firefly import (
        FireflyCodec,
        init_firefly_params,
    )
    from fish_speech_tpu.models.dual_ar import init_dual_ar_params
    from fish_speech_tpu.pipeline import TTSPipeline

    cfg = DualARConfig.fish_speech_1_5()
    tok = TokenConfig(
        im_end_id=100011,
        pad_id=5,
        semantic_start_id=100012,
        semantic_end_id=100012 + cfg.codebook_size - 1,
    )
    codec_cfg = FireflyConfig.for_version(FishVersion.V1_5)
    params = init_dual_ar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # zero the im_end head column so untrained-weight generations never
    # terminate early: with the runaway reroll disabled below, every run
    # decodes exactly max_new_tokens frames — deterministic wall-clock
    params["output"] = params["output"].at[:, tok.im_end_id].multiply(0.0)
    codec_params = init_firefly_params(
        jax.random.PRNGKey(1), codec_cfg, jnp.float32
    )
    engine = LMEngine(
        params, cfg, tok, WhichLM.FISH_1_5, cache_len=2048, dtype=jnp.bfloat16
    )
    codec = FireflyCodec(codec_params, codec_cfg)

    class _HashTokenizer:
        """Word-hash tokenizer so --random-weights needs no tokenizer.json."""

        SPECIALS = {
            "<|im_start|>": 100007,
            "<|im_end|>": 100011,
            "<|semantic|>": 5,
            "<|voice|>": 100010,
            "<|semantic:0|>": 100012,
        }

        class _Enc:
            def __init__(self, ids):
                self.ids = ids

        def token_to_id(self, t):
            return self.SPECIALS.get(t)

        def encode(self, text, add_special_tokens=True):
            ids = []
            i = 0
            while i < len(text):
                for sp, sid in self.SPECIALS.items():
                    if text.startswith(sp, i):
                        ids.append(sid)
                        i += len(sp)
                        break
                else:
                    j = i
                    while j < len(text) and not text.startswith("<|", j):
                        j += 1
                    ids.extend(1000 + (hash(w) % 90000) for w in text[i:j].split())
                    i = j
            return self._Enc(ids)

    pipe = TTSPipeline(engine, codec, _HashTokenizer(), WhichLM.FISH_1_5)
    pipe.reroll_on_runaway = False  # fixed-length benchmark generations
    return pipe


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--fish-version", default="1.5")
    ap.add_argument("--text", default=DEFAULT_TEXT)
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    args = ap.parse_args()

    from fish_speech_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    if args.random_weights or args.checkpoint is None:
        log("loading random-weight Fish-1.5-architecture pipeline")
        pipeline = _load_random_pipeline()
    else:
        from fish_speech_tpu.config import WhichModel
        from fish_speech_tpu.pipeline import TTSPipeline

        pipeline = TTSPipeline.load(
            args.checkpoint, WhichModel(args.fish_version)
        )

    frame_rate = pipeline.codec.cfg.frame_rate
    kwargs = dict(max_new_tokens=args.max_new_tokens, seed=0)

    def run(label, fn):
        t0 = time.perf_counter()
        try:
            pcm = fn()
        except RuntimeError as e:
            log(f"{label}: FAILED ({e})")
            return
        wall = time.perf_counter() - t0
        audio_s = len(pcm) / pipeline.codec.sample_rate
        log(
            f"{label}: wall {wall:.2f}s, audio {audio_s:.2f}s, "
            f"RTF {wall / max(audio_s, 1e-9):.4f}"
        )

    # warmup/compile pass (excluded from the timings, like a warmed server)
    log("warmup (compiling)...")
    t0 = time.perf_counter()
    try:
        pipeline.synthesize(args.text, **kwargs)
    except RuntimeError:
        pass
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    # warm the batched path too so scenario timings exclude compiles
    try:
        pipeline.synthesize_batched(args.text, 4, **kwargs)
    except RuntimeError:
        pass

    # scenario 1: unbatched request (reference: benchmark.rs single case)
    run("unbatched", lambda: pipeline.synthesize(args.text, **kwargs))
    # scenario 2: batch_size=1 through the batched path
    run(
        "batch_size=1",
        lambda: pipeline.synthesize_batched(args.text, 1, **kwargs),
    )
    # scenario 3: batch_size=4
    run(
        "batch_size=4",
        lambda: pipeline.synthesize_batched(args.text, 4, **kwargs),
    )
    log(f"frame rate: {frame_rate:.3f} Hz")


if __name__ == "__main__":
    main()
