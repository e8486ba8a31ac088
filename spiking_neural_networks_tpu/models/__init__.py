from . import base, integrate_and_fire, hodgkin_huxley, morris_lecar
from . import ion_channels, spike_train, dopa
