from .intent_classes import INTENT_CLASSES, NUM_INTENT_CLASSES
