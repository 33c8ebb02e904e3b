"""Minimal stand-in for the gym 0.18-era API surface used by the reference
repo, so the conformance harness can import /root/reference without installing
gym.  This is a test fixture, not product code: it implements only Env,
Wrapper/ObservationWrapper attribute forwarding, spaces, and a tiny registry —
just enough for gym_novel_gridworlds to import and run.
"""

from . import error, spaces, utils  # noqa: F401


class Env:
    metadata = {"render.modes": []}
    reward_range = (-float("inf"), float("inf"))
    spec = None
    action_space = None
    observation_space = None

    def reset(self, **kwargs):
        raise NotImplementedError

    def step(self, action):
        raise NotImplementedError

    def render(self, mode="human"):
        pass

    def close(self):
        pass

    def seed(self, seed=None):
        return [seed]

    @property
    def unwrapped(self):
        return self


class Wrapper(Env):
    def __init__(self, env):
        self.env = env
        # gym 0.18 Wrapper copies the spaces at wrap time; without this the
        # Env class attributes (None) shadow __getattr__ forwarding
        self.action_space = env.action_space
        self.observation_space = env.observation_space
        self.metadata = env.metadata

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.env, name)

    @property
    def unwrapped(self):
        return self.env.unwrapped

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        return self.env.step(action)

    def render(self, mode="human", **kwargs):
        return self.env.render(mode, **kwargs)

    def close(self):
        return self.env.close()


class ObservationWrapper(Wrapper):
    def reset(self, **kwargs):
        obs = self.env.reset(**kwargs)
        return self.observation(obs)

    def step(self, action):
        obs, reward, done, info = self.env.step(action)
        return self.observation(obs), reward, done, info

    def observation(self, observation):
        raise NotImplementedError


class core:  # gym.core.Wrapper / gym.core.ObservationWrapper
    Env = Env
    Wrapper = Wrapper
    ObservationWrapper = ObservationWrapper


_REGISTRY = {}


def register(id, entry_point=None, **kwargs):
    _REGISTRY[id] = (entry_point, kwargs)


def make(id, **kwargs):
    entry_point, reg_kwargs = _REGISTRY[id]
    if isinstance(entry_point, str):
        mod, cls = entry_point.split(":")
        import importlib
        entry_point = getattr(importlib.import_module(mod), cls)
    return entry_point(**{**reg_kwargs, **kwargs})
