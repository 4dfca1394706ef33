from .config import AttrDict, load_hparams_from_json, build_env
