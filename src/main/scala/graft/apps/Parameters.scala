package graft.apps

/** The indri Parameters tree (reference: include/indri/Parameters.hpp,
  * src/Parameters.cpp): an ordered multi-map XML tree with dotted-path
  * command-line overlays. Apps read typed values off it — repeated
  * elements accumulate, scalar reads take the LAST occurrence (a later
  * `-count=5` overrides the file's value, the loadCommandLine behavior).
  */
final case class ParamTree(value: String, kids: Vector[(String, ParamTree)]) {

  def all(name: String): Seq[ParamTree] = kids.collect { case (`name`, t) => t }

  def first(name: String): Option[ParamTree] = all(name).headOption

  def last(name: String): Option[ParamTree] = all(name).lastOption

  /** scalar read at a dotted path; last occurrence wins */
  def get(path: String, default: String): String = getOpt(path).getOrElse(default)

  def getOpt(path: String): Option[String] = {
    val parts = path.split('.')
    parts.init.foldLeft(Option(this))((t, n) => t.flatMap(_.last(n)))
      .flatMap(_.last(parts.last)).map(_.value)
  }

  def getInt(path: String, default: Int): Int = get(path, default.toString).toInt

  def getDouble(path: String, default: Double): Double =
    get(path, default.toString).toDouble

  def getBool(path: String, default: Boolean): Boolean =
    getOpt(path).map(v => v == "true" || v == "1").getOrElse(default)

  /** list read at a dotted path (all occurrences, file order) */
  def list(path: String): Seq[String] = {
    val parts = path.split('.')
    parts.init.foldLeft(Seq(this))((ts, n) => ts.flatMap(_.all(n)))
      .flatMap(_.all(parts.last)).map(_.value)
  }

  private def withChild(name: String, t: ParamTree): ParamTree =
    copy(kids = kids :+ (name -> t))

  /** append `-a.b=v` (Parameters::loadCommandLine): intermediate path
    * elements reuse the LAST existing node (so `-stopper.word=x` extends
    * the file's stopper block), the leaf always appends.
    */
  def overlaid(key: String, v: String): ParamTree = {
    val parts = key.split('.')
    if (parts.length == 1) withChild(key, ParamTree(v, Vector.empty))
    else last(parts.head) match {
      case Some(sub) =>
        val replaced = sub.overlaid(parts.tail.mkString("."), v)
        val i = kids.lastIndexWhere(_._1 == parts.head)
        copy(kids = kids.updated(i, parts.head -> replaced))
      case None =>
        withChild(parts.head,
          ParamTree("", Vector.empty).overlaid(parts.tail.mkString("."), v))
    }
  }
}

object ParamTree {

  def parseXml(xml: String): ParamTree = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    require(root.getNodeName == "parameters",
      s"expected <parameters> root, got <${root.getNodeName}>")
    fromElement(root)
  }

  private def fromElement(e: org.w3c.dom.Element): ParamTree = {
    val l = e.getChildNodes
    val kids = (0 until l.getLength).map(l.item).collect {
      case c: org.w3c.dom.Element => c.getNodeName -> fromElement(c)
    }.toVector
    ParamTree(e.getTextContent.trim, kids)
  }

  /** apply `-key=value` overlays in order */
  def overlay(tree: ParamTree, args: Seq[String]): ParamTree =
    args.foldLeft(tree) { (t, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      t.overlaid(s.substring(0, i), s.substring(i + 1))
    }
}
