from .fcn_lecturenet import FCNLectureNet, FCNConfig
from .convert import torch_state_dict_to_flax
