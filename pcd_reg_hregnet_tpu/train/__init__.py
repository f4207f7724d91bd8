from .experiments import available as available_experiments
from .experiments import experiment
from .loop import (TrainState, create_state, fit, make_eval_step,
                   make_train_step, restore_checkpoint, restore_params,
                   run_epoch, save_checkpoint)
from .objective import RegistrationObjective
from .optimizer import make_optimizer, make_schedule

__all__ = ['experiment', 'available_experiments', 'fit', 'TrainState',
           'create_state', 'make_train_step', 'make_eval_step', 'run_epoch',
           'save_checkpoint', 'restore_checkpoint', 'restore_params', 'RegistrationObjective',
           'make_optimizer', 'make_schedule']
from .feats import (FeatsObjective, create_feats_state,
                    make_feats_train_step, transplant_backbone)
from .feats_loop import fit_feats
__all__ += ['FeatsObjective', 'create_feats_state', 'make_feats_train_step',
            'transplant_backbone', 'fit_feats']
