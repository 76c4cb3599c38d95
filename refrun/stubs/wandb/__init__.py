"""No-op wandb stub so the unmodified reference code can run offline.

The reference calls wandb.login/init/log/finish and wandb.run.log_code
(reference: main_SimpleDyG.py:443-445,296; train/train_retriever.py:301;
train/train_generator.py:219). Everything here swallows its arguments.
"""


class _Run:
    def log_code(self, *a, **k):
        pass


run = _Run()


def login(*a, **k):
    pass


def init(*a, **k):
    return run


def log(*a, **k):
    pass


def finish(*a, **k):
    pass
