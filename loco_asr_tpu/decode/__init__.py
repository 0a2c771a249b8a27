from .beam import greedy_decode, beam_search, BeamHypotheses
from .fusion import FusionLM
from .context import ConversationContext
