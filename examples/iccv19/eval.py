#!/usr/bin/env python3
"""Evaluate trained models by following provided .yaml scenarios.

Usage parity with the reference (``mdir/examples/iccv19/eval.py``)::

    ./eval.py [scenario.yml ...]      # explicit scenario overlay
    ./eval.py test                    # shortcut for eval.yml + eval_test.yml
    ./eval.py clahe | composition     # other shortcuts

Scenario structure::

    network:
      path: <network dir/file path or URL>
      runtime: <runtime override, such as wrappers>
    validation: <validation section>
    data:
      test: <data parameters>
"""
import os.path
import sys

import yaml

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(
    os.path.realpath(__file__)), "..", "..")))

from mdir_tpu.config import load_scenario
from mdir_tpu.data.testdata import download_test
from mdir_tpu.stages.validate import validate
from mdir_tpu.tools.utils import get_data_root


def main(argv):
    if os.environ.get("MDIR_TPU_SKIP_DOWNLOAD", "") != "1":
        download_test(get_data_root())

    scenarios = argv[1:]
    here = os.path.dirname(os.path.realpath(__file__))
    if len(scenarios) == 1 and not scenarios[0].endswith(".yml"):
        scenarios = [os.path.join(here, "eval.yml"),
                     os.path.join(here, "eval_%s.yml" % scenarios[0])]

    # the shared loader treats an empty / comment-only yaml as a no-op
    # overlay instead of wiping everything merged so far
    scenario = load_scenario(scenarios)
    if not scenario:
        sys.stderr.write("Scenario needs to be specified\n")
        return 1

    metadata, = validate(scenario, ())

    scores = {
        "roxford5k/validation/score:ap_medium_avg.4": "roxford.5k medium",
        "rparis6k/validation/score:ap_medium_avg.4": "rparis.6k medium",
        "247tokyo1k/validation/score:ap_avg.4": "247tokyo.1k",
    }
    for heading, section in metadata.items():
        print("\n%s\n" % heading.capitalize())
        for key, value in section.items():
            if key in scores:
                print("    %-20s %s" % (scores[key], round(100 * value, 2)))
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
