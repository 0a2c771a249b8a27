from . import layers, attention, audio
