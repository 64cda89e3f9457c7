"""gym.spaces.Discrete / Box stand-ins (only the attributes the reference
touches: Discrete.n — navigator.py:7,75; Box shape/dtype metadata —
track_1v1.py:255-259)."""

import numpy as np


class Space:
    def __init__(self, shape=None, dtype=None):
        self.shape = tuple(shape) if shape is not None else None
        self.dtype = np.dtype(dtype) if dtype is not None else None

    def sample(self):
        raise NotImplementedError


class Discrete(Space):
    def __init__(self, n):
        super().__init__(shape=(), dtype=np.int64)
        self.n = int(n)

    def sample(self):
        return int(np.random.randint(self.n))

    def contains(self, x):
        return 0 <= int(x) < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


class Box(Space):
    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        super().__init__(shape=shape, dtype=dtype)
        self.low = np.full(self.shape, low, dtype=self.dtype)
        self.high = np.full(self.shape, high, dtype=self.dtype)

    def sample(self):
        return np.random.uniform(self.low, self.high).astype(self.dtype)

    def contains(self, x):
        x = np.asarray(x)
        return x.shape == self.shape and (x >= self.low).all() and (x <= self.high).all()

    def __repr__(self):
        return f"Box{self.shape}"
