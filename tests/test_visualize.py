"""Visualization utilities produce files headlessly (reference parity:
`visualize/visualize_results.py`, `visualize_inference.py`)."""
import jax
import numpy as np

from pcd_reg_hregnet_tpu.models import RegistrationModel
from pcd_reg_hregnet_tpu.utils.visualize import (FeatureMapVisualizer,
                                                 InferenceVisualizer,
                                                 VisualizeResults)

from test_models import make_inputs, small_cfg


def fake_results(n=50):
    rng = np.random.default_rng(0)
    return {'error_calib': rng.normal(0, 0.1, size=(n, 6))}


class TestResultPlots:
    def test_all_plots_written(self, tmp_path):
        viz = VisualizeResults(str(tmp_path))
        res = fake_results()
        for path in (viz.error_distributions(res),
                     viz.box_plots({'layer_1': res, 'layer_2': fake_results()}),
                     viz.recall_curve(res)):
            import os
            assert os.path.getsize(path) > 0

    def test_bev(self, tmp_path):
        rng = np.random.default_rng(1)
        viz = InferenceVisualizer(str(tmp_path))
        path = viz.bev(rng.normal(size=(100, 3)), rng.normal(size=(100, 3)),
                       rng.normal(size=(100, 3)))
        import os
        assert os.path.getsize(path) > 0

    def test_sequence_video(self, tmp_path):
        # reference visualize_inference.py:72-84 equivalent: animated GIF
        rng = np.random.default_rng(2)
        viz = InferenceVisualizer(str(tmp_path))
        frames = [(rng.normal(size=(50, 3)), rng.normal(size=(50, 3)),
                   rng.normal(size=(50, 3))) for _ in range(3)]
        out = viz.sequence_video(frames, fps=4)
        import os
        assert out.endswith('.gif') and os.path.getsize(out) > 0
        from PIL import Image
        img = Image.open(out)
        assert getattr(img, 'n_frames', 1) == 3


class TestFeatureMaps:
    def test_capture_and_plot(self, tmp_path):
        model = RegistrationModel(small_cfg('hregnet'))
        src, dst = make_inputs(n=128)
        variables = model.init(jax.random.PRNGKey(0), src, dst, train=False)
        inter = FeatureMapVisualizer.capture(model, variables, src, dst)
        flat = FeatureMapVisualizer.flatten(inter)
        assert flat, 'no intermediates captured'
        name, act = next((kv for kv in flat.items() if np.asarray(kv[1]).ndim >= 3))
        viz = FeatureMapVisualizer(str(tmp_path))
        path = viz.plot(name, act)
        import os
        assert os.path.getsize(path) > 0


class TestVisualizeCLI:
    def test_cli_plot_suite(self, tmp_path):
        # `visualize` subcommand = reference visualize_results.py __main__
        import json
        import os
        rng = np.random.default_rng(3)
        results = {f'layer_{i}': {
            'error_calib': rng.normal(scale=0.2, size=(16, 6)).tolist()}
            for i in range(3)}
        results['dataset'] = 'synthetic'
        path = tmp_path / 'results.json'
        path.write_text(json.dumps(results))
        from pcd_reg_hregnet_tpu.cli import main
        out = tmp_path / 'plots'
        assert main(['visualize', '--results', str(path),
                     '--out', str(out)]) == 0
        for f in ('finest_dist.png', 'layers_box.png', 'recall.png'):
            assert os.path.getsize(out / f) > 0
