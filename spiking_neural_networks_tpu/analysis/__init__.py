from . import eeg, correlation
