"""Experiment recipes: the loss/model wiring of each reference trainer script,
as data + pure functions over one shared trainer (SURVEY.md §1 key fact)."""

from tfcgan_tpu.recipes.base import GANRecipe
from tfcgan_tpu.recipes.tfcgan import TFCGANRecipe
from tfcgan_tpu.recipes.stn import STNRecipe
from tfcgan_tpu.recipes.cyclegan import CycleGANRecipe
from tfcgan_tpu.recipes.thermalgan import ThermalGANRecipe
from tfcgan_tpu.recipes.nemar import NeMARRecipe
from tfcgan_tpu.recipes.diffusion import DiffusionRecipe


def build_recipe(cfg):
    """Instantiate the recipe named by ``cfg.recipe``."""
    from tfcgan_tpu.config import ExperimentConfig

    assert isinstance(cfg, ExperimentConfig)
    table = {
        "tfcgan": TFCGANRecipe,
        "stn": STNRecipe,
        "cyclegan": CycleGANRecipe,
        "thermalgan": ThermalGANRecipe,
        "nemar": NeMARRecipe,
        "diffusion": DiffusionRecipe,
    }
    return table[cfg.recipe](cfg)
