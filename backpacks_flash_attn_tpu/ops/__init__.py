from . import attention, dense, norms
