from .config import SpeechT5Config
from . import prenets, encoder, decoder, model, import_torch
