import numpy as np


class Space:
    def __init__(self, shape=None, dtype=None):
        self.shape = shape
        self.dtype = dtype


class Discrete(Space):
    def __init__(self, n):
        super().__init__((), np.int64)
        self.n = n

    def sample(self):
        return int(np.random.randint(self.n))

    def contains(self, x):
        return 0 <= int(x) < self.n


class Box(Space):
    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        super().__init__(tuple(shape), dtype)
        self.low = np.broadcast_to(np.asarray(low), shape)
        self.high = np.broadcast_to(np.asarray(high), shape)


class Dict(Space):
    def __init__(self, spaces_dict):
        super().__init__(None, None)
        self.spaces = spaces_dict
