"""Method-string DSL parser: dispatch priority and modifier extraction."""

import pytest

from pcgmix_tpu.augment.methods import parse_method


@pytest.mark.parametrize(
    "method,base",
    [
        ("base", None),
        ("durratiomixup", "durratiomixup"),
        ("(rand)durratiomixup", "durratiomixup"),
        ("durmixmagwarp(0.2,4)", "durmixmagwarp"),
        ("durmixmagwarp(0.2,4)+0.8", "durmixmagwarp"),
        ("durmixrespscale(12,20)", "durmixrespscale"),
        ("respiratoryscale(12,20)", "respiratoryscale"),
        ("mixup(same)", "mixup"),
        ("mixup(mix)", "mixup"),
        ("latentmixup", "latentmixup"),
        ("timemask(0.2)", "timemask"),
        ("timewarp(0.05,2)", "timewarp"),
        ("magnitudewarp(0.2,4)", "magnitudewarp"),
        ("gaussiannoise(25,40)", "gaussiannoise"),
        # wav-durratiocutmix must win over wavcutmix and durratiocutmix
        ("wav-durratiocutmix", "wav-durratiocutmix"),
        ("wavcutmix", "wavcutmix"),
        ("durratiocutmix", "durratiocutmix"),
        ("(UMC-subset)durratiocutmix", "(UMC-subset)durratiocutmix"),
        ("lengthcutmix(5bins)", "lengthcutmix"),
        ("datasetcutmix", "datasetcutmix"),
        ("labelcutmix", "labelcutmix"),
        ("lc-nointrusion", "lc-nointrusion"),
        ("swapsysdia", "swapsysdia"),
        ("cont-cutmix", "cont-cutmix"),
        ("saliency-cutmix", "saliency-cutmix"),
        ("cutmix", "cutmix"),
        ("manifold-cutmix", "cutmix"),
        ("manifold-cutout(ch)", "cutout"),
        ("cutout", "cutout"),
        ("s1s2mask", "s1s2mask"),
        ("SELCbase", None),  # SELC modifies the loss, not the augmentation
    ],
)
def test_dispatch_priority_1d(method, base):
    assert parse_method(method).base == base


@pytest.mark.parametrize(
    "method,base",
    [
        ("durmixcutout", "durmixcutout"),
        ("durmixtimemask", "durmixtimemask"),
        ("durmixfreqmask", "durmixfreqmask"),
        ("durratiomixup", "durratiomixup"),
        ("freqmask(0.1)", "freqmask"),
        ("timemask(0.1)", "timemask"),
        ("cutout(0.25,0.25)", "cutout"),
        ("mixup(mix)", "mixup"),
        ("cutmix(rand)", "cutmix"),
        ("durratiocutmix", "durratiocutmix"),
    ],
)
def test_dispatch_priority_2d(method, base):
    assert parse_method(method, spectrogram=True).base == base


def test_notebook_concatenated_method_quirk():
    """experiments_timeseries.ipynb cell 9's aug_methods list is missing a
    comma, so 'respiratoryscale(12,20)' and 'durratiomixup' concatenate
    into ONE string.  The reference's first-match dispatch
    (augmentations.py:777 before :931) runs it as respiratoryscale — pin
    the same priority here (see PARITY.md)."""
    s = parse_method("respiratoryscale(12,20)durratiomixup")
    assert s.base == "respiratoryscale"
    # rates are stored in Hz (the reference divides breaths/min by 60,
    # augmentations.py:792-793)
    assert s.params == (12 / 60, 20 / 60)


def test_trueseed_label_is_base():
    """'base-trueseed=N' (experiments_timeseries.ipynb cell 11) is a run
    LABEL: no augmentation branch matches, exactly like 'base'."""
    s = parse_method("base-trueseed=19")
    assert s.base is None and not s.selc


def test_modifiers():
    s = parse_method("(sameCVD)(rand)durmixmagwarp(0.3,6)+0.6")
    assert s.base == "durmixmagwarp"
    assert s.prob == 0.6
    assert s.pairing == "same_cvd"
    assert s.rand
    assert s.params == (0.3, 6)

    s = parse_method("(alpha=0.5)durratiomixup")
    assert s.alpha == 0.5

    s = parse_method("(closestknn=8)durratiomixup")
    assert s.pairing == "closestknn" and s.pairing_param == 8

    s = parse_method("(closestbins=4)durmixmagwarp(0.2,4)")
    assert s.pairing == "closestbins" and s.pairing_param == 4

    s = parse_method("(saloptenv-2)durratiomixup")
    assert s.salopt == "env" and s.salopt_model == 2

    s = parse_method("(saloptsum)durratiomixup")
    assert s.salopt == "sum" and s.salopt_model == 0

    s = parse_method("(mixAll)durratiomixup")
    assert s.pairing == "mix_all" and s.mix_all_targets

    s = parse_method("(smooth)labelcutmix")
    assert s.smooth

    s = parse_method("SELCmixup(same)+0.8")
    assert s.selc and s.base == "mixup" and s.prob == 0.8

    s = parse_method("(class_majority)durratiomixup")
    assert s.class_majority

    s = parse_method("lengthcutmix(10bins)")
    assert s.pairing == "same_length" and s.pairing_param == 10

    s = parse_method("(samePCG)durratiomixup")
    assert s.pairing == "same_wav"

    s = parse_method("(sameDataset)durmixmagwarp(0.2,4)")
    assert s.pairing == "same_dataset"


def test_bare_mixup_rejected():
    with pytest.raises(ValueError, match="mixup requires"):
        parse_method("mixup")
    with pytest.raises(ValueError, match="mixup requires"):
        parse_method("mixup", spectrogram=True)


def test_defaults():
    s = parse_method("durmixmagwarp")
    assert s.params == (0.2, 4)
    s = parse_method("timewarp")
    assert s.params == (0.05, 2)
    s = parse_method("respiratoryscale")
    assert s.params == (12 / 60, 20 / 60)
    s = parse_method("timemask")
    assert s.params == (0.2,)
    s = parse_method("cutout")
    assert s.params == (0.05,)
