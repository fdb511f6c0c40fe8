from arah_tpu.config.loader import (load_config, update_recursive,
                                    model_config_from_cfg,
                                    loss_weights_from_cfg,
                                    optim_config_from_cfg)

__all__ = ['load_config', 'update_recursive', 'model_config_from_cfg',
           'loss_weights_from_cfg', 'optim_config_from_cfg']
