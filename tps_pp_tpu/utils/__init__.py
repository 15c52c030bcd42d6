from . import checkpoint, torch_convert
