"""train stage: epoch loop of train -> validate -> close_epoch.

Parity with ``mdir/stages/train.py``: notrain shortcut when epochs == 0,
pre-learning const data at epoch -1, per-epoch event loggers, resource stats
at the very end, returns learning.metadata.
"""
from ..learning import initialize_learning


def train(params, data):
    learning = initialize_learning(params, data, device=None)

    # off-the-shelf save only
    if learning.training.epoch == -1 and not learning.training.remains_epochs:
        learning.checkpoints.save_notrain(learning.network.state_dict())
        return ({},)

    if learning.training.epoch == -1:
        for const_data in learning.network.const_data():
            learning.events.register_data(
                None, None, None, "net/%s" % const_data["key"],
                const_data["data"], const_data["dtype"])

    for epoch in learning:
        logger = (lambda e: lambda iteration, size, label, value, dtype:
                  learning.events.register_data(
                      e, iteration, size, "train/%s" % label, value, dtype)
                  )(epoch.epoch)
        iterations = epoch.train.iterate(
            learning.network, learning.training.optimizer, None, logger)
        for i, _step_data in enumerate(iterations):
            if not learning.training.remains_epochs \
                    and i == len(epoch.train.data_loader) - 1:
                learning.resources.take_current_stats()

        for val, valtask in epoch.vals:
            logger = (lambda e, v: lambda iteration, size, label, value, dtype:
                      learning.events.register_data(
                          e, iteration, size,
                          "%s/learning/%s" % (v, label), value, dtype)
                      )(epoch.epoch, val)
            valtask.validate(learning.network, None, logger)

        learning.close_epoch()

    return (learning.metadata,)
