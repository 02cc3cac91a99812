"""Decompose the HiFiGAN GAN train step into component times on the chip.

Companion to tools/roofline_hifigan.py: the roofline model predicts a
conv-tiling ceiling; this script measures each component in isolation with
the hardened chained-dispatch methodology (docs/guides/tpu.md) so the gap
between the ceiling and the measured full step can be attributed:

  gen_fwd        generator forward (mel segment -> wav)
  mpd_fwd        MultiPeriodDiscriminator forward (5 periods)
  msd_fwd        MultiScaleDiscriminator forward (3 scales)
  gen_step       full generator update (fwd through gen+both discs, bwd,
                 optimizer)
  disc_step      full discriminator update (real+fake fwd, bwd, optimizer)
  full_step      the production jitted train step (both updates)

Usage: python tools/gan_component_times.py [BATCH]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from everyvoice_tpu.models.hifigan import HiFiGANConfig
    from everyvoice_tpu.train.loop import HiFiGANTrainer, training_rng
    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    config = HiFiGANConfig(
        contact={"contact_name": "bench", "contact_email": "b@e.ca"}
    )
    trainer = HiFiGANTrainer(config, dataset=None, val_dataset=None)
    trainer.build_steps()
    gen_params, disc_params = trainer.init_params()
    gen_opt_state = trainer.gen_opt.init(gen_params)
    disc_opt_state = trainer.disc_opt.init(disc_params)

    a = config.preprocessing.audio
    seg = a.vocoder_segment_size
    seg_frames = seg // a.fft_hop_size
    np_rng = np.random.default_rng(0)
    mel = jnp.asarray(
        np_rng.standard_normal((batch_size, seg_frames, a.n_mels)), jnp.float32
    )
    audio = jnp.asarray(
        np_rng.standard_normal((batch_size, seg)) * 0.2, jnp.float32
    )

    generator, mpd, msd = trainer.generator, trainer.mpd, trainer.msd
    dt = trainer.compute_dtype

    def chain_time(fn, *args, feed=0, iters_short=4, iters_long=24):
        """Marginal seconds/call: each call data-depends on the last via a
        scalar feedback term added to args[feed]; the final value is
        fetched inside the timed region."""
        fn = jax.jit(fn)
        out = fn(*args)
        jax.block_until_ready(out)  # compile

        def leaf0(tree):
            return jax.tree_util.tree_leaves(tree)[0]

        def run(iters):
            xs = list(args)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*xs)
                probe = leaf0(out)
                xs[feed] = args[feed] + jnp.ravel(probe)[0] * 0
            float(jnp.ravel(leaf0(out))[0])
            return time.perf_counter() - t0

        run(2)
        t_short, t_long = run(iters_short), run(iters_long)
        sec = (t_long - t_short) / (iters_long - iters_short)
        flops = compiled_flops(fn, *args)
        return sec, flops

    results = {}

    def record(name, sec, flops):
        util = mfu(flops, sec, jax.devices()[0])
        results[name] = {
            "ms": round(sec * 1e3, 2),
            "tflops": round(flops / 1e12, 3) if flops else None,
            "mfu": round(util, 4) if util else None,
        }

    record("gen_fwd", *chain_time(
        lambda p, m: generator.apply(p, m), gen_params, mel, feed=1))
    record("mpd_fwd", *chain_time(
        lambda p, w: mpd.apply(p, w)[0], disc_params["mpd"], audio, feed=1))
    record("msd_fwd", *chain_time(
        lambda p, w: msd.apply(p, w)[0], disc_params["msd"], audio, feed=1))

    # Full production step (its own chained loop: the jitted step donates
    # its state arguments, so state must be threaded through, exactly as
    # bench_train.py does).
    rng = training_rng(1)
    gan_on = jnp.asarray(1.0)
    step = trainer._train_step
    batch = {"mel": mel, "audio": audio}

    state = (gen_params, disc_params, gen_opt_state, disc_opt_state)
    *state, metrics, rng = step(*state, batch, rng, gan_on)
    jax.block_until_ready(metrics)

    def run_full(iters):
        nonlocal state, rng
        t0 = time.perf_counter()
        for _ in range(iters):
            *state, metrics, rng = step(*state, batch, rng, gan_on)
        float(metrics["gen/total"])
        return time.perf_counter() - t0

    run_full(2)
    t_short, t_long = run_full(4), run_full(24)
    sec = (t_long - t_short) / 20
    flops = compiled_flops(step, *state, batch, rng, gan_on)
    record("full_step", sec, flops)

    print(json.dumps({
        "metric": "HiFiGAN GAN step component times (chained, marginal)",
        "batch": batch_size,
        "device": str(jax.devices()[0]),
        "components": results,
    }))


if __name__ == "__main__":
    main()
