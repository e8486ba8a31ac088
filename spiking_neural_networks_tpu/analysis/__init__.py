from . import eeg, correlation, peaks
