from .ppyolo_2x import PPYOLO_2x_Config
from .ppyolo_r18vd import PPYOLO_r18vd_Config
from .ppyolo_2x_custom import PPYOLO_2x_Custom_Config

# --config=N mapping identical to the reference CLI (tools/argparser.py:43-58)
CONFIGS = {
    0: PPYOLO_2x_Config,
    1: PPYOLO_r18vd_Config,
    2: PPYOLO_2x_Custom_Config,
}


def get_config(index: int):
    return CONFIGS[int(index)]()
