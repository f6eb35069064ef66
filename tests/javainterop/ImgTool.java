// Third-party codec ground truth for tests/test_java_interop.py: the JDK's
// own javax.imageio plugins (TIFF since JDK 9, plus BMP/GIF/PNG) decode and
// encode fixtures independently of the repo's Python codecs, so the Python
// side is validated against a real foreign implementation instead of only
// self-roundtrips.
//
//   decode <in-image> <out-bin>
//       reads any ImageIO-supported image, writes big-endian ints:
//       width, height, then h*w ARGB pixels (row-major).
//   decode-raw <in-image> <out-bin>
//       same, but writes width, height, bands, then h*w*bands RAW raster
//       samples, bypassing getRGB's color-space conversion (gray->sRGB is
//       nonlinear), for gray-sample comparisons.
//   decode-wav <in-wav> <out-bin>
//       reads a WAV via javax.sound (PCM, U-law, A-law), converts to
//       16-bit signed PCM, writes big-endian ints: channels, then the
//       interleaved samples.
//   encode <format> <w> <h> <raw-file> <out-image> [compressionType]
//       raw-file holds w*h*3 RGB bytes (or w*h*4 RGBA when its size says
//       so); format is an ImageIO format name (TIFF, BMP, GIF, PNG);
//       compressionType is e.g. LZW or PackBits for TIFF.
import java.awt.image.BufferedImage;
import java.io.BufferedOutputStream;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import java.nio.file.Files;
import java.nio.file.Paths;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public class ImgTool {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("decode")) {
            BufferedImage img = ImageIO.read(new File(args[1]));
            if (img == null) {
                System.err.println("ImageIO could not read " + args[1]);
                System.exit(2);
            }
            int w = img.getWidth(), h = img.getHeight();
            DataOutputStream out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(args[2])));
            out.writeInt(w);
            out.writeInt(h);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    out.writeInt(img.getRGB(x, y));
            out.close();
        } else if (args[0].equals("decode-raw")) {
            BufferedImage img = ImageIO.read(new File(args[1]));
            if (img == null) {
                System.err.println("ImageIO could not read " + args[1]);
                System.exit(2);
            }
            java.awt.image.Raster r = img.getRaster();
            int w = img.getWidth(), h = img.getHeight();
            int bands = r.getNumBands();
            DataOutputStream out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(args[2])));
            out.writeInt(w);
            out.writeInt(h);
            out.writeInt(bands);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int b = 0; b < bands; b++)
                        out.writeInt(r.getSample(x, y, b));
            out.close();
        } else if (args[0].equals("decode-wav")) {
            javax.sound.sampled.AudioInputStream in =
                javax.sound.sampled.AudioSystem.getAudioInputStream(new File(args[1]));
            javax.sound.sampled.AudioFormat base = in.getFormat();
            javax.sound.sampled.AudioFormat pcm = new javax.sound.sampled.AudioFormat(
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                base.getSampleRate(), 16, base.getChannels(),
                base.getChannels() * 2, base.getSampleRate(), false);
            javax.sound.sampled.AudioInputStream conv =
                javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, in);
            byte[] all = conv.readAllBytes();
            DataOutputStream out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(args[2])));
            out.writeInt(base.getChannels());
            for (int i = 0; i + 1 < all.length; i += 2)
                out.writeInt((short) ((all[i] & 255) | (all[i + 1] << 8)));
            out.close();
        } else if (args[0].equals("encode")) {
            String fmt = args[1];
            int w = Integer.parseInt(args[2]), h = Integer.parseInt(args[3]);
            byte[] raw = Files.readAllBytes(Paths.get(args[4]));
            boolean alpha = raw.length == w * h * 4;
            int c = alpha ? 4 : 3;
            BufferedImage img = new BufferedImage(
                w, h, alpha ? BufferedImage.TYPE_INT_ARGB : BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int i = (y * w + x) * c;
                    int r = raw[i] & 255, g = raw[i + 1] & 255, b = raw[i + 2] & 255;
                    int a = alpha ? raw[i + 3] & 255 : 255;
                    img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b);
                }
            ImageWriter wri = ImageIO.getImageWritersByFormatName(fmt).next();
            ImageWriteParam p = wri.getDefaultWriteParam();
            if (args.length > 6 && !args[6].equals("none")) {
                p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
                p.setCompressionType(args[6]);
            }
            ImageOutputStream ios = ImageIO.createImageOutputStream(new File(args[5]));
            wri.setOutput(ios);
            wri.write(null, new IIOImage(img, null, null), p);
            ios.close();
        } else {
            System.err.println("usage: decode|encode ...");
            System.exit(2);
        }
    }
}
