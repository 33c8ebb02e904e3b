"""L5 driver tests: train CLI (incl. mid-training novelty injection),
enjoy with a checkpoint, socket protocol, demo recording, monitor plumbing,
checkpoint round-trip."""

import json
import os
import socket as socket_mod
import threading
import time

import numpy as np
import pytest

import jax


def test_train_enjoy_roundtrip(tmp_path):
    from ngx.cli.train import main as train_main
    from ngx.cli.enjoy import main as enjoy_main

    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    train_main(["-env", "NovelGridworld-v0", "-steps", "16384",
                "-num_envs", "128", "-rollout", "16", "-episode_cap", "50",
                "-log", log, "-ckpt", ckpt])
    assert os.path.exists(os.path.join(ckpt, "final"))
    assert os.path.exists(os.path.join(log, "progress.monitor.csv"))
    enjoy_main(["-env", "NovelGridworld-v0", "-episodes", "2",
                "-episode_cap", "30", "-ckpt", os.path.join(ckpt, "final")])


def test_train_with_novelty_injection(tmp_path):
    """remapaction injected mid-training (dims unchanged) must keep
    training without error — the reference's RemapActionOnStep experiment."""
    from ngx.cli.train import main as train_main
    train_main(["-env", "NovelGridworld-v0", "-steps", "8192",
                "-num_envs", "64", "-rollout", "16",
                "-log", str(tmp_path / "log2"),
                "-inject_novelty_at", "4096", "-novelty", "remapaction",
                "-novelty_difficulty", "hard"])


def test_socket_protocol():
    import ngx.compat as C
    from ngx.cli.socket_env import serve

    np.random.seed(0)
    env = C.make("NovelGridworld-v6")
    port = 9411
    t = threading.Thread(target=serve,
                         kwargs=dict(env=env, port=port, max_steps=10),
                         daemon=True)
    t.start()
    time.sleep(0.8)

    env2 = C.make("NovelGridworld-v6")
    sock = socket_mod.socket()
    sock.connect(("127.0.0.1", port))
    try:
        for i in range(10):
            a = env2.action_space.sample()
            sock.send(str.encode(env2.spec.actions[a]))
            msg = json.loads(sock.recv(8192).decode())
            assert set(msg) == {"observation", "reward", "done"}
            assert isinstance(msg["reward"], float)
    finally:
        sock.close()
    t.join(timeout=5)


def test_record_demos_npz(tmp_path):
    from ngx.cli.record_demos import main as rec
    out = str(tmp_path / "demos.npz")
    rec(["-env", "NovelGridworld-Bow-v0", "-episodes", "2",
         "-policy", "random", "-episode_cap", "20", "-out", out])
    d = np.load(out)
    assert sorted(d.files) == ["actions", "episode_returns", "episode_starts",
                               "obs", "rewards"]
    assert d["obs"].shape[0] == d["actions"].shape[0] == d["rewards"].shape[0]
    assert d["episode_starts"][0]
    assert d["episode_returns"].shape == (2,)


def test_monitor_and_plot(tmp_path):
    import ngx.compat as C
    from ngx.utils.monitor import Monitor, load_results, ts2xy
    from ngx.cli.plot_results import main as plot

    np.random.seed(0)
    env = Monitor(C.make("NovelGridworld-v0"), str(tmp_path))
    for ep in range(3):
        env.reset()
        for t in range(60):
            _, _, done, _ = env.step(env.action_space.sample())
            if done:
                break
    env.close()
    rows = load_results(str(tmp_path))
    assert len(rows) >= 1
    x, y = ts2xy(rows)
    assert len(x) == len(rows)
    plot(["-log", str(tmp_path), "-agents", ".",
          "-out", str(tmp_path / "lc.png")])
    assert os.path.exists(tmp_path / "lc.png")


def test_checkpoint_roundtrip_env_state(tmp_path):
    """EnvState is a pytree → orbax checkpoint/restore is the env-level
    checkpointing story (SURVEY.md §5)."""
    import ngx
    from ngx.utils.checkpoint import restore_pytree, save_pytree

    spec = ngx.make_spec("NovelGridworld-Pogostick-v1")
    state, _ = jax.jit(ngx.make_reset(spec))(jax.random.key(0))
    path = str(tmp_path / "env_ckpt")
    save_pytree(path, state)
    restored = restore_pytree(path, like=state)
    assert type(restored) is type(state)
    np.testing.assert_array_equal(np.asarray(state.map),
                                  np.asarray(restored.map))
    np.testing.assert_array_equal(np.asarray(state.inventory),
                                  np.asarray(restored.inventory))


def test_train_resume_roundtrip(tmp_path):
    """-resume restores params AND optimizer state (failure recovery)."""
    from ngx.cli.train import main as train_main
    train_main(["-env", "NovelGridworld-v0", "-steps", "8192",
                "-num_envs", "64", "-rollout", "8",
                "-log", str(tmp_path / "l1"), "-ckpt", str(tmp_path / "c1")])
    assert (tmp_path / "c1" / "resume").exists()
    train_main(["-env", "NovelGridworld-v0", "-steps", "4096",
                "-num_envs", "64", "-rollout", "8",
                "-resume", str(tmp_path / "c1" / "resume"),
                "-log", str(tmp_path / "l2"), "-ckpt", str(tmp_path / "c2")])
    assert (tmp_path / "c2" / "final").exists()


def test_bc_pretrain_flag(tmp_path):
    """-pretrain consumes a record_demos .npz (reference train.py:125-132)."""
    import numpy as np
    from ngx.cli.record_demos import main as demos_main
    from ngx.cli.train import main as train_main
    npz = str(tmp_path / "demos.npz")
    demos_main(["-env", "NovelGridworld-v0", "-episodes", "2",
                "-episode_cap", "20", "-policy", "random", "-out", npz])
    z = np.load(npz)
    assert z["obs"].shape[0] == z["actions"].shape[0] > 0
    train_main(["-env", "NovelGridworld-v0", "-steps", "4096",
                "-num_envs", "64", "-rollout", "8",
                "-pretrain", npz, "-pretrain_steps", "20",
                "-log", str(tmp_path / "l3")])


def test_train_solve_shaped_with_bc_anchor(tmp_path):
    """Round-4 solver-recipe flags: -reward_mode solve + -bc_anchor."""
    from ngx.cli.record_demos import main as demos_main
    from ngx.cli.train import main as train_main

    npz = str(tmp_path / "demos.npz")
    demos_main(["-env", "NovelGridworld-v0", "-episodes", "3",
                "-policy", "expert", "-out", npz])
    ckpt = str(tmp_path / "ckpt")
    train_main(["-env", "NovelGridworld-v0", "-steps", "4096",
                "-num_envs", "64", "-rollout", "16", "-episode_cap", "30",
                "-reward_mode", "solve", "-best_metric", "solve",
                "-bc_anchor", npz, "-bc_coef", "0.1",
                "-log", str(tmp_path / "log"), "-ckpt", ckpt])
    assert os.path.exists(os.path.join(ckpt, "final"))


def test_train_chain_cli(tmp_path):
    """The -chain mode trains the last stage from batched restore states."""
    from ngx.cli.train import main as train_main

    ckpt = str(tmp_path / "chain_ckpt")
    train_main(["-chain", "NovelGridworld-v2,NovelGridworld-v3",
                "-env", "NovelGridworld-v3", "-steps", "2048",
                "-num_envs", "64", "-rollout", "8", "-episode_cap", "30",
                "-log", str(tmp_path / "log"), "-ckpt", ckpt])
    assert os.path.exists(os.path.join(ckpt, "final"))


def test_dagger_cli(tmp_path):
    """DAgger driver end-to-end on a tiny config."""
    from ngx.cli.dagger import main as dagger_main

    ckpt = str(tmp_path / "dagger")
    dagger_main(["-env", "NovelGridworld-v0", "-rounds", "2",
                 "-episodes_per_round", "4", "-bc_steps", "100",
                 "-eval_episodes", "16", "-sharpen", "1,2",
                 "-ckpt", ckpt])
    assert os.path.exists(os.path.join(ckpt, "best"))
