"""Pipeline-wide constants.

Mirrors the reference's static configuration surface:
  * attribute budget table       -> /root/reference/attack_utils/proj_utils.py:16-21
  * FRS input resolutions etc.   -> /root/reference/attack_utils/gen_utils.py:16-41
  * StyleGAN truncation settings -> /root/reference/models/model_settings.py:64-72
"""

from collections import OrderedDict

# Per-attribute perturbation budgets (semi-axes of the semantic hyper-ellipsoid).
# The README documents this table as the user-editable config point.
ATTRS = OrderedDict(
    [
        ("age", 0.5),
        ("eyeglasses", 0.5),
        ("gender", 0.2),
        ("pose", 0.5),
        ("smile", 0.8),
    ]
)

# Face-recognition systems and their input resolutions.
FRS_METHODS = ["insightface", "facenet", "facenet-vggface2"]
INP_RESOLS = {"insightface": 112, "facenet": 160, "facenet-vggface2": 160}

# Image normalisation applied before the FRS (Normalize(0.5, 0.5)).
MEAN = 0.5
STD = 0.5

# Embedding / latent dimensionality.
EMB_SIZE = 512

LOSS_TYPES = ["away", "nearest", "diff", "xent", "dlr"]
OPTIMS = ["Adam", "SGD", "RMSProp"]
ATTACKS = ["fab-t", "fab", "apgd-ce", "apgd-dlr", "apgd-t", "manual",
           "square",
           # TPU-framework additions: the reference's full sequential
           # run_standard_evaluation (autoattack.py:93-238) with the
           # 'standard' / 'rand' / 'plus' set_version presets (:284-316;
           # our 'plus' omits only untargeted FAB — see attacks/autoattack).
           "autoattack", "autoattack-rand", "autoattack-plus"]

LAT_SPACE = "w"
DATASET = "ffhq"
GAN_NAME = "stylegan"
IMAGE_EXT = "png"

# StyleGAN inference settings (match the reference's frozen configuration).
STYLEGAN_TRUNCATION_PSI = 0.7
STYLEGAN_TRUNCATION_LAYERS = 8
STYLEGAN_RANDOMIZE_NOISE = False
