"""Performance breakdown driver (feeds docs/PERF.md).

    python -m ngx.cli.perf -batch 65536 -steps 256            # ablations
    python -m ngx.cli.perf --policy -batch 8192 -steps 256    # fused-vs-XLA
    python -m ngx.cli.perf --trainer -batch 8192              # PPO train-step A/B
    python -m ngx.cli.perf --profile                          # jax.profiler trace

Ablation mode times the bench kernel (ngx.vector.throughput_fn) against three
variants that each remove one suspected cost: threefry action sampling ->
counter-hash / fixed action, and the done->reset lax.cond -> no auto-reset.
The deltas attribute the step budget to (env kernel | action RNG | reset).

Policy mode benchmarks the fused Pallas policy+env rollout
(ngx.ops.pallas_rollout, action_source='policy') against the plain XLA scan
doing the identical acting loop — the measured verdict on whether the fused
kernel earns its keep.
"""

from __future__ import annotations

import argparse
import json
import time


def _time(fn, *args, repeats=3):
    """Best-of-N wall time; forces the scalar result home (block_until_ready
    can return early over the tunneled-TPU transport, see bench.py)."""
    out = fn(*args)
    float(out[1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[1])
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-env", default="NovelGridworld-Pogostick-v1")
    p.add_argument("-batch", type=int, default=65536)
    p.add_argument("-steps", type=int, default=256)
    p.add_argument("-repeats", type=int, default=3)
    p.add_argument("--policy", action="store_true")
    p.add_argument("--trainer", action="store_true",
                   help="A/B the full PPO train step (rollout+GAE+update) "
                        "over the xla vs pallas acting backends "
                        "(docs/PERF.md end-to-end table)")
    p.add_argument("--profile", action="store_true")
    p.add_argument("-block", type=int, default=256,
                   help="pallas block size (policy mode; 256 measured best "
                        "— 7.45M vs 6.57M at 512, docs/PERF.md)")
    p.add_argument("-novelty", default="",
                   help="trainer mode: inject this novelty into the spec "
                        "before the A/B (e.g. 'firewall:easy' or "
                        "'fence:medium:oak') — measures the fused kernel on "
                        "the reference's novelty-adaptation scenario")
    p.add_argument("-platform", default="auto", choices=("cpu", "tpu", "auto"))
    args = p.parse_args(argv)

    from . import set_platform
    set_platform(args.platform)
    import jax
    import jax.numpy as jnp
    import ngx
    from ngx.vector import throughput_fn

    B, S = args.batch, args.steps
    spec = ngx.make_spec(args.env)
    key = jax.random.key(0)
    results = {}

    if args.trainer:
        from ngx.rl.train import PPOConfig, make_train

        spec_override = None
        if args.novelty:
            parts = args.novelty.split(":")
            spec_override = ngx.inject_novelty(spec, *parts)
            print(f"trainer spec: {args.env} + {args.novelty}")
        cfg = PPOConfig(env_id=args.env, num_envs=B, rollout_steps=64)
        for backend in ("xla", "pallas"):
            try:
                init, train_step = make_train(cfg, spec_override=spec_override,
                                              rollout_backend=backend)
            except ValueError as e:
                print(f"train step [{backend:6s}]: skipped ({e})")
                continue
            carry = init(key)
            step = jax.jit(train_step)
            carry, m = step(carry, jax.random.key(1))
            float(m["mean_reward"])
            best = float("inf")
            for i in range(args.repeats):
                t0 = time.perf_counter()
                carry, m = step(carry, jax.random.key(2 + i))
                float(m["mean_reward"])
                best = min(best, time.perf_counter() - t0)
            results[f"train_step_{backend}"] = B * 64 / best
            print(f"train step [{backend:6s}]: {B*64/best/1e6:8.2f}M "
                  f"env-steps/s ({best*1e3:.0f}ms/update)")
    elif args.policy:
        from ngx.ops.pallas_rollout import (make_pallas_rollout,
                                            make_xla_policy_rollout)
        from ngx.rl.models import ActorCritic
        from ngx.transforms import lidar_in_front

        lspec = lidar_in_front(spec)
        model = ActorCritic(n_actions=lspec.n_actions, hidden=(64, 64))
        obs0 = ngx.make_reset(lspec)(key)[1]
        params = model.init(jax.random.key(1),
                            jnp.zeros((1, obs0.shape[0]), jnp.float32))

        xla = make_xla_policy_rollout(lspec, params, B, S)
        t = _time(xla, key, repeats=args.repeats)
        results["xla_policy_scan"] = B * S / t
        print(f"xla policy scan   : {B*S/t/1e6:8.1f}M steps/s")

        fused = make_pallas_rollout(lspec, B, S, block=args.block,
                                    action_source="policy",
                                    policy_params=params)
        t = _time(jax.jit(fused), 0, repeats=args.repeats)
        results["pallas_policy_fused"] = B * S / t
        print(f"pallas policy fused: {B*S/t/1e6:8.1f}M steps/s")
    else:
        variants = [
            ("full (threefry actions, auto-reset)", {}),
            ("hash-rng actions", {"action_rng": "hash"}),
            ("fixed action (no RNG)", {"action_rng": "fixed"}),
            ("no auto-reset", {"auto_reset": False}),
            # the roofline falsification pair (docs/PERF.md): packing wins
            # at the 8k carry-bound regime, loses at 262k saturation
            ("bit-packed carry", {"packed": True}),
        ]
        for name, kw in variants:
            run = throughput_fn(spec, B, S, **kw)
            t = _time(run, key, repeats=args.repeats)
            results[name] = B * S / t
            print(f"{name:38s}: {B*S/t/1e6:8.1f}M steps/s "
                  f"({t*1e9/(B*S):6.2f} ns/step)")

        if args.profile:
            import os
            outdir = "results/profile"
            os.makedirs(outdir, exist_ok=True)
            run = throughput_fn(spec, B, S)
            with jax.profiler.trace(outdir):
                jax.block_until_ready(run(jax.random.fold_in(key, 9)))
            print("trace written to", outdir)

    print(json.dumps({"batch": B, "steps": S,
                      "platform": jax.devices()[0].platform,
                      "steps_per_s": results}))


if __name__ == "__main__":
    main()
