from . import distribution
