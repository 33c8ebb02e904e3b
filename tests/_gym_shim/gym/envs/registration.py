import gym


def register(id, entry_point=None, **kwargs):
    gym.register(id, entry_point, **kwargs)
