from .sspsr import SSPSR
from .gelin import GELIN
from .edsr import EDSR
from .gdrrn import GDRNN
from .mcnet import MCNet
from .cegatsr import CEGATSR
from .gan3d import Discriminator as GAN3DDiscriminator
from .gan3d import Generator as GAN3DGenerator

__all__ = [
    "CEGATSR",
    "EDSR",
    "GAN3DDiscriminator",
    "GAN3DGenerator",
    "GDRNN",
    "GELIN",
    "MCNet",
    "SSPSR",
]
