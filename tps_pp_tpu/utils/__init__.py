from . import checkpoint, torch_convert, fileio, profiling, visualize
from .fileio import list_from_file, list_to_file, collect_env
from .string_util import StringStrip
