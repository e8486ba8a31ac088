from .builder import neuron_builder, neuron_builder_from_file
from . import parser, builder
