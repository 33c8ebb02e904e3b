class seeding:
    @staticmethod
    def np_random(seed=None):
        import numpy as np
        rng = np.random.RandomState(seed)
        return rng, seed
