from . import distribution, transfer, checkpoint, profiling
