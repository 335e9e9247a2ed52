"""Learning-rate schedules as pure epoch→factor functions.

Mirrors /root/reference/mdir/components/optim/scheduler/base_schedulers.py.
The reference steps torch schedulers once per epoch; here the host computes the
factor for the current epoch and injects it into the optimizer's hyperparams
(the jitted step never sees a Python scheduler object).
"""
import math


def const_schedule(**_):
    return lambda epoch: 1.0


def lambda_schedule(nepochs, fixed_ratio):
    """Fixed then linear decay to zero (base_schedulers.py:15-20)."""
    def factor(epoch):
        return 1 - max(0, epoch + 1 - fixed_ratio * nepochs) / float((1 - fixed_ratio) * nepochs + 1)
    return factor


def lambda_p2p_schedule(nepochs, n_epochs_decay):
    """CycleGAN linear decay (base_schedulers.py:28-45)."""
    n_epochs = nepochs - n_epochs_decay

    def factor(epoch):
        return 1.0 - max(0, epoch + 1 - n_epochs) / float(n_epochs_decay + 1)
    return factor


def gamma_schedule(nepochs, gamma):
    """Exponential decay; accepts "exp(x)" strings (base_schedulers.py:21-26).

    factor(e) for 0-indexed epoch e is gamma**e — torch ExponentialLR holds
    base_lr * gamma^0 during the FIRST epoch (decays after it). The previous
    gamma**(e+1) decayed one step early (found by review; the multistep
    golden had papered over it with an epoch==0 special case)."""
    if isinstance(gamma, str) and gamma.startswith("exp(") and gamma.endswith(")"):
        gamma = math.exp(float(gamma[4:-1]))
    return lambda epoch: float(gamma) ** epoch


SCHEDULES = {
    "const": lambda nepochs, **kw: const_schedule(),
    "lambda": lambda nepochs, **kw: lambda_schedule(nepochs, kw["fixed_ratio"]),
    "lambda_p2p": lambda nepochs, **kw: lambda_p2p_schedule(nepochs, kw["n_epochs_decay"]),
    "gamma": lambda nepochs, **kw: gamma_schedule(nepochs, kw["gamma"]),
}


def initialize_schedule(nepochs, params):
    params = dict(params)
    algorithm = params.pop("algorithm")
    return SCHEDULES[algorithm](nepochs, **params)
