from otgan_tpu.models import dcgan, densenet, toy_mlp


def get_model(name: str):
    """Model-family switch, mirroring the reference's ``--model`` flag
    (``train.py:38-41``). Returns the module namespace exposing
    ``make_generator`` / ``make_discriminator``."""
    if name == "dcgan":
        return dcgan
    if name == "densenet":
        return densenet
    if name == "toy_mlp":
        return toy_mlp
    raise ValueError(f"unknown model {name!r}; choose dcgan|densenet|toy_mlp")
