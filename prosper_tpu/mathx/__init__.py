from . import rng, color, packing, transforms
