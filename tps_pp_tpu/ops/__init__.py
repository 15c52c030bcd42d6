from . import grid_sample, tps
