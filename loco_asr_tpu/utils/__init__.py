from . import pytree, metrics
