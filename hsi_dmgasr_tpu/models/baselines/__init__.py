from .sspsr import SSPSR
from .gelin import GELIN
from .edsr import EDSR
from .gdrrn import GDRNN
from .mcnet import MCNet

__all__ = ["EDSR", "GDRNN", "GELIN", "MCNet", "SSPSR"]
