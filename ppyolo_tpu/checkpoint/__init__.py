from .io import (save_params_npz, load_params_npz, save_train_state,
                 AsyncCheckpointer,
                 load_train_state, resume_step_from_filename, gc_checkpoints)
from .convert import (convert_torch_state_dict, load_torch_state_dict,
                      convert_paddle_state_dict, load_paddle_state_dict)
