from . import kinetics, receptors, graph
